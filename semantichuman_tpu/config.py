"""Configuration system.

Typed dataclass tree with YAML overrides — replaces the reference's global
mutable yacs CfgNode singleton (reference: configure/cfgs.py:5-123).  Configs
here are immutable values passed explicitly; anything that reaches jitted code
does so as trace-time static Python data.

Usage:
    cfg = Config.from_yaml("configs/train_dfaust.yaml")
    cfg = Config()  # code defaults (mirror reference defaults + traincfg.yaml)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml


@dataclass
class ModelConfig:
    model_name: str = "dfaust_multiz8_partkps8"
    # 'multiz+partkps' (paper flagship) or 'neural3DMM' (baseline AE)
    model_type: str = "multiz+partkps"
    ds_factors: list = field(default_factory=lambda: [2, 2, 2, 2])
    step_sizes: list = field(default_factory=lambda: [2, 2, 1, 1, 1])
    dilation: list = field(default_factory=lambda: [2, 2, 1, 1, 1])
    # [per-level main filters, per-level optional extra filters]
    filter_sizes_enc: list = field(
        default_factory=lambda: [[3, 16, 32, 64, 128], [[], [], [], [], []]])
    filter_sizes_dec: list = field(
        default_factory=lambda: [[128, 64, 32, 32, 16], [[], [], [], [], 3]])
    part_shape_latent_size: int = 8
    part_kps_latent_size: int = 8
    nz: int = 256             # latent size for the neural3DMM baseline
    activation: str = "elu"
    vae: bool = False
    # numeric policy: 'float32' or 'bfloat16' for the conv trunk
    trunk_dtype: str = "float32"
    # allow Pallas kernels where measured profitable: the LIVE kernel is
    # the VMEM-fused distance loss (ops.pallas.part_dist_pallas); the
    # spiral-conv kernel exists as a measured-and-rejected record and only
    # engages under SH_TPU_FORCE_PALLAS=1 (ops.pallas.spiral_conv_pallas)
    use_pallas: bool = True
    # block-banded one-hot spiral gather at the fine levels (ops/banding.py):
    # exploits spiral locality to turn the gather row floor into MXU
    # matmuls.  ON by default since the r4 on-chip probe: the dispatch
    # gates route banding only where measured profitable (conv b<=16 at
    # 2.0-5.5x, unpool b<=128 at 1.6-1.8x — docs/BENCHMARKS.md "The r4
    # on-chip probe day"), and at every other shape the program is
    # bit-identical to banded_conv=false (compile-cache-hit-verified at
    # the B=128 headline), so the flag only ever changes dispatch where
    # the chip said yes.
    banded_conv: bool = True


@dataclass
class DataConfig:
    root_dir: str = "data/DFAUST"
    dataset: str = "DFAUST"
    n_val: int = 0
    normalization: str = "zeroroot"  # substring-matched modes, see data.dataset
    measure: bool = True
    shuffle: bool = True
    # prefer memory-mapped preprocessed/{train,test}.npy over the
    # per-sample points_* layout (zero file opens per step)
    from_stacked: bool = True
    # path to the reference's downsampling_matrices{dddd}.pkl: imports the
    # EXACT reference hierarchy (QSLIM tie-breaking is machine-dependent),
    # required for carrying reference DFAUST checkpoints
    reference_hierarchy: Optional[str] = None
    # host pipeline prefetch depth (batches staged ahead on device)
    prefetch: int = 2
    # stage whole splits into device HBM and materialize batches with an
    # on-device gather + fused normalization (zero per-step H2D traffic;
    # a full DFAUST train split is ~2.7 GB, well within one chip's HBM).
    # 'auto' = on whenever the sources are arrays and the total fits the
    # budget below; True forces it (error if unsupported); False = host
    # pipeline (per-step take + normalize + transfer)
    device_resident: Any = "auto"
    device_resident_max_gb: float = 6.0
    asset_dir: str = "data/asset"
    # synthetic fallback when no DFAUST data present (tests / benches)
    synthetic: bool = False
    synthetic_train: int = 256
    synthetic_test: int = 64
    # synthetic mesh resolution (None = SMPL-scale 53x130 ~ 6892 verts)
    synthetic_n_theta: Optional[int] = None
    synthetic_n_phi: Optional[int] = None


@dataclass
class TrainConfig:
    n_epochs: int = 300
    batch_train: int = 4
    batch_test: int = 16
    batch_interp: int = 4
    lr: float = 1e-3
    weight_decay: float = 5e-5        # torch-style coupled L2 inside Adam
    lr_decay: float = 0.99            # per-epoch exponential (StepLR gamma)
    # linear lr ramp over the first N epochs (large-batch stabilizer;
    # 0 = reference schedule)
    lr_warmup_epochs: int = 0
    # 'exp' (reference StepLR gamma) | 'cosine' (anneal to 0 over
    # n_epochs — fixed-budget fast recipes)
    lr_schedule: str = "exp"
    # global-norm gradient clip (0 = off, reference parity); stabilizer
    # for near-the-edge large-batch recipes (see train/optim.py)
    grad_clip: float = 0.0
    # Adam second-moment decay (0.999 = torch default, reference parity);
    # lower values shorten v-memory — the stale-v stabilizer for
    # large-batch recipes (see train/optim.py)
    adam_b2: float = 0.999
    # >0: skip (zero-update) steps whose grads contain NaN/Inf, giving up
    # after N consecutive bad steps (optax.apply_if_finite); guards long
    # scan-chunked runs from one-step poisoning.  0 = off (reference parity)
    skip_nonfinite: int = 0
    seed: int = 2
    # loss switches / weights (epoch thresholds gate when a term turns on)
    edgereg_epoch: int = 0
    edgereg_w: float = 1e-2
    zpartreg_epoch: int = 0
    zpartreg_w: float = 1e-2
    vol_epoch: int = 0
    vol_w: float = 1e-2
    interp_epoch: int = 0
    interp_kps_w: float = 1.0
    interp_euc_w: float = 1e-2
    exc_epoch: int = 0
    exc_kps_w: float = 1.0
    exc_euc_w: float = 1e-2
    # weighted-distance-loss shaping
    w_mode: str = "threshold"         # all_one | linear | sin | threshold
    w_threshold: float = 0.8
    w_part_mode: str = "1/K"          # n/N | 1/K | 1/rand_num
    relat_flag: bool = True
    # latent-edit branch
    edit_mode: str = "equal"          # equal | rand | exc
    rand_mode: str = "rand"           # rand | warm_up
    exc_mode: str = "ori_or_m"        # m | ori_m | ori | ori_or_m
    editskl_flag: bool = False
    noleaf_flag: bool = True
    leafkeep_flag: bool = True
    factor: list = field(default_factory=lambda: [0.4, 0.8])
    # checkpointing
    ck_frequency: int = 100
    ck_keep: Optional[int] = None     # keep only the newest N checkpoints
    ck_name: str = "checkpoint"
    resume: Optional[str] = None      # checkpoint dir to resume from
    # reference .pth.tar to resume from: weights + Adam moments + schedule
    # position (the reference's main.py:277-292 resume path)
    resume_torch: Optional[str] = None
    finetune: bool = False            # load weights only, restart schedule
    eval_flag: bool = True
    # run the val pass every N epochs (1 = reference behavior; raising it
    # removes ~0.2-0.3 s/epoch of eval stall from fast large-batch recipes)
    val_every: int = 1
    save_recons: bool = True
    # parallelism
    data_parallel: bool = True        # shard batch over all local devices
    # run each epoch as ONE jitted lax.scan over the step schedule when the
    # data is device-resident (single-process, part model): ~3x faster
    # first-epoch compile (one program replaces the per-variant step set)
    # and zero per-step host work; steady-state throughput is unchanged on
    # the v5e (the small-batch step is row-floor-bound, not dispatch-bound)
    epoch_scan: bool = True
    # fuse up to N consecutive epochs into one scan dispatch (clipped at
    # val/checkpoint/sample/flag boundaries).  1 = one dispatch per epoch;
    # raise for fast small-epoch recipes where per-dispatch overhead
    # (~0.3 s on a remote-tunnel host) dominates the epoch
    scan_epochs: int = 1
    log_every: int = 0                # extra step-level logging (0 = per-epoch)
    # profiling: capture a jax.profiler trace of global steps [start, stop)
    profile_start: int = 0
    profile_stop: int = 0             # 0 = profiling off


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    out_dir: str = "results"

    @staticmethod
    def from_yaml(path: str) -> "Config":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return Config.from_dict(raw)

    @staticmethod
    def from_dict(raw: dict) -> "Config":
        cfg = Config()
        return _merge(cfg, raw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _merge(node: Any, raw: dict) -> Any:
    if not dataclasses.is_dataclass(node):
        raise TypeError(f"cannot merge into non-dataclass {node!r}")
    updates = {}
    valid = {f.name: f for f in dataclasses.fields(node)}
    for key, val in raw.items():
        if key not in valid:
            raise KeyError(
                f"unknown config key {key!r} for {type(node).__name__}; "
                f"valid keys: {sorted(valid)}")
        cur = getattr(node, key)
        if dataclasses.is_dataclass(cur) and isinstance(val, dict):
            updates[key] = _merge(cur, val)
        else:
            updates[key] = val
    return dataclasses.replace(node, **updates)

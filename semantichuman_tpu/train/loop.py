"""Trainer: the single init+train+eval orchestration path.

Replaces the reference's duplicated module-level scripts (main.py and
utils_SH.py:225-410 replay the same precompute) with one class:

  topology compile (cached) -> assets -> model -> loss tables -> optimizer
  -> jitted step cache -> epoch loop (train/val) -> orbax checkpoints
  -> final eval + prediction export.

Data-parallel by default: batch arrays land sharded over all local devices,
params replicated; XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..config import Config

from ..data.assets import BodyAssets
from ..data.dataset import (ArraySource, BatchLoader, FileSource, MeshData,
                            prefetch_to_device)
from ..models import build_model
from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from ..topology import compile_topology
from ..utils.checkpoint import restore_checkpoint, save_checkpoint
from ..utils.logging import MetricsLogger
from . import losses as L
from .edits import EditSampler
from .optim import make_optimizer
from .step import (flags_for_epoch, make_baseline_train_step,
                   make_epoch_scan_step, make_eval_step, make_train_step)


class Trainer:
    def __init__(self, cfg: Config, workdir: str,
                 assets: BodyAssets | None = None, data=None):
        self.cfg = cfg
        self.workdir = workdir
        # multi-process (multi-host) context: call
        # parallel.distributed.initialize_distributed() BEFORE constructing
        # the Trainer (cli/train.py --distributed does)
        self.n_processes = jax.process_count()
        self.process_index = jax.process_index()
        self._is_main = self.process_index == 0
        self.process_slice = None
        self.device_data = None
        if cfg.train.data_parallel and self.n_processes > 1:
            self.process_slice = (self.process_index, self.n_processes)
        for sub in ("checkpoints", "summaries", "samples", "predictions"):
            os.makedirs(os.path.join(workdir, sub), exist_ok=True)

        # --- assets + data ----------------------------------------------------
        self._synthetic = None
        if assets is None:
            if cfg.data.synthetic:
                assets, self._synthetic = BodyAssets.synthetic(
                    n_theta=cfg.data.synthetic_n_theta,
                    n_phi=cfg.data.synthetic_n_phi)
            else:
                assets = BodyAssets.load(
                    cfg.data.asset_dir,
                    os.path.join(cfg.data.root_dir, "template",
                                 "template.obj"))
        elif cfg.data.synthetic and data is None:
            # explicit assets + synthetic sampling: generate meshes on the
            # caller's template so data and assets stay consistent
            from ..data.synthetic import SyntheticHuman
            self._synthetic = SyntheticHuman(
                n_theta=cfg.data.synthetic_n_theta,
                n_phi=cfg.data.synthetic_n_phi)
            if (len(self._synthetic.template_verts)
                    != len(assets.template_verts)):
                raise ValueError(
                    f"explicit assets have {len(assets.template_verts)} "
                    f"template vertices but the synthetic generator at "
                    f"n_theta={cfg.data.synthetic_n_theta} / "
                    f"n_phi={cfg.data.synthetic_n_phi} produces "
                    f"{len(self._synthetic.template_verts)} — set "
                    "data.synthetic_n_theta/n_phi to match the assets")
        self.assets = assets
        self._setup_data(data)

        # --- topology (cached per ds_factors) --------------------------------
        m = cfg.model
        tag = "".join(str(f) for f in m.ds_factors)
        cache = os.path.join(workdir, f"topology_{tag}.npz")
        ref_vertex = min(414, len(assets.template_verts) - 1)
        if cfg.data.reference_hierarchy:
            from ..topology.reference_import import (
                check_template_match, hierarchy_from_reference_pickle)
            self.hierarchy = hierarchy_from_reference_pickle(
                cfg.data.reference_hierarchy, step_sizes=m.step_sizes,
                dilation=m.dilation, reference_vertex=ref_vertex,
                cache_path=os.path.join(workdir, f"topology_ref_{tag}.npz"))
            check_template_match(self.hierarchy, assets.template_verts)
        else:
            self.hierarchy = compile_topology(
                assets.template_verts, assets.template_faces,
                ds_factors=m.ds_factors, step_sizes=m.step_sizes,
                dilation=m.dilation, reference_vertex=ref_vertex,
                cache_path=cache)

        # --- model / losses / optimizer --------------------------------------
        self.model = build_model(cfg, self.hierarchy, assets.part_dict)
        self.tables = L.build_loss_tables(
            assets.template_faces, assets.j_regressor, assets.part_dict)
        self.steps_per_epoch = max(len(self.train_loader), 1)
        self.optimizer = make_optimizer(
            cfg.train.lr, cfg.train.weight_decay, cfg.train.lr_decay,
            self.steps_per_epoch, warmup_epochs=cfg.train.lr_warmup_epochs,
            schedule_kind=cfg.train.lr_schedule,
            n_epochs=cfg.train.n_epochs, grad_clip=cfg.train.grad_clip,
            adam_b2=cfg.train.adam_b2,
            skip_nonfinite=cfg.train.skip_nonfinite)
        self.params = self.model.init(cfg.train.seed)
        self.opt_state = self.optimizer.init(self.params)
        self.start_epoch = 1
        self.global_step = 0
        if cfg.train.resume and cfg.train.resume_torch:
            raise ValueError("set train.resume OR train.resume_torch, "
                             "not both")
        if cfg.train.resume:
            self._resume(cfg.train.resume, cfg.train.finetune)
        elif cfg.train.resume_torch:
            self._resume_torch(cfg.train.resume_torch, cfg.train.finetune)

        # --- parallel placement ----------------------------------------------
        self.mesh = None
        self.batch_shard = None
        if cfg.train.data_parallel and (len(jax.devices()) > 1
                                        or self.n_processes > 1):
            t = cfg.train
            n_total = len(jax.devices())
            batches = (t.batch_train, t.batch_interp, t.batch_test)
            if self.n_processes > 1:
                # multi-host: the mesh MUST span every process's devices
                # (a prefix mesh would leave some processes without any
                # addressable shard) — so divisibility is a hard requirement
                bad = [b for b in batches if b % n_total]
                if bad:
                    raise ValueError(
                        f"multi-host DP over {n_total} devices needs every "
                        f"batch size divisible by {n_total}; got {bad}")
                self.mesh = make_mesh(jax.devices())
            else:
                # single host: DP over the largest device count that divides
                # every batch size
                n = n_total
                while n > 1 and any(b % n for b in batches):
                    n -= 1
                if n > 1:
                    if n < n_total:
                        import warnings
                        warnings.warn(
                            f"data-parallel mesh uses only {n}/{n_total} "
                            f"devices: batch sizes {batches} are not all "
                            f"divisible by {n_total} — the remaining chips "
                            "sit idle; raise the batch sizes to use them",
                            stacklevel=2)
                    self.mesh = make_mesh(jax.devices()[:n])
            if self.mesh is not None:
                from ..parallel.mesh import put_replicated
                self.batch_shard = batch_sharding(self.mesh)
                self.params = put_replicated(self.params, self.mesh)
                self.opt_state = put_replicated(self.opt_state, self.mesh)
        self._maybe_stage_device_data()

        self.sampler = EditSampler(
            edit_mode=cfg.train.edit_mode, rand_mode=cfg.train.rand_mode,
            factor=cfg.train.factor, noleaf_flag=cfg.train.noleaf_flag,
            editskl_flag=cfg.train.editskl_flag, exc_mode=cfg.train.exc_mode,
            seed=cfg.train.seed)
        self.logger = MetricsLogger(os.path.join(workdir, "summaries"))
        self.trace_window = None
        if cfg.train.profile_stop > cfg.train.profile_start:
            from ..utils.profiling import TraceWindow
            self.trace_window = TraceWindow(
                os.path.join(workdir, "profile"),
                cfg.train.profile_start, cfg.train.profile_stop)
        self._step_cache: dict = {}
        self._eval_steps: dict = {}
        self.is_part_model = cfg.model.model_type == "multiz+partkps"

    # --- data ------------------------------------------------------------------
    def _setup_data(self, data):
        cfg = self.cfg
        jr = self.assets.j_regressor
        if data is not None:
            self.data = data
        elif cfg.data.synthetic:
            sh = self._synthetic
            train = sh.sample_meshes(cfg.data.synthetic_train,
                                     seed=cfg.train.seed)
            test = sh.sample_meshes(cfg.data.synthetic_test,
                                    seed=cfg.train.seed + 1)
            self.data = {
                "train": ArraySource(train.astype(np.float32),
                                     sh.measures(train).astype(np.float32)),
                "val": ArraySource(test.astype(np.float32)),
                "test": ArraySource(test.astype(np.float32)),
            }
            self.mesh_data = None
            # gass/normal need dataset statistics even without a MeshData
            from ..data.dataset import compute_stats
            self._stats = compute_stats(train, test, cfg.data.normalization)
        else:
            root = os.path.join(cfg.data.root_dir, "preprocessed")
            n_val = cfg.data.n_val
            val_paths = os.path.join(root, "paths_val.npy")
            if (cfg.data.from_stacked and n_val == 0
                    and os.path.exists(val_paths)):
                # honor the val split data_generation carved: the stacked
                # path must not silently train on the val samples
                n_val = len(np.load(val_paths))
            self.mesh_data = MeshData(cfg.data.root_dir, n_val,
                                      cfg.data.normalization)
            if cfg.data.from_stacked:
                # memory-mapped stacked arrays: zero per-step file opens
                # (the per-sample FileSource layout pays one np.load per
                # sample per batch)
                md = self.mesh_data
                meas = None
                mpath = os.path.join(root, "train_measurements.npy")
                if cfg.data.measure:
                    if not os.path.exists(mpath):
                        raise FileNotFoundError(
                            f"data.measure=True but {mpath} is missing "
                            "(run cli.obj2npy, or set data.measure: false)")
                    meas = np.load(mpath, mmap_mode="r")
                self.data = {"train": ArraySource(
                    md.vertices_train,
                    None if meas is None else meas[:len(md.vertices_train)])}
                if md.vertices_test is not None:
                    self.data["test"] = ArraySource(md.vertices_test)
                if len(md.vertices_val):
                    self.data["val"] = ArraySource(md.vertices_val)
                if "val" not in self.data and "test" not in self.data:
                    raise ValueError(
                        "no val or test split: provide preprocessed/"
                        "test.npy or set data.n_val > 0")
                self.data.setdefault("val", self.data.get("test"))
                self.data.setdefault("test", self.data["val"])
            else:
                self.data = {
                    split: FileSource(root, split, measure=cfg.data.measure
                                      and split == "train")
                    for split in ("train", "val", "test")
                    if os.path.exists(os.path.join(root,
                                                   f"paths_{split}.npy"))}
                if "val" not in self.data:
                    self.data["val"] = self.data["test"]
        stats = getattr(self, "_stats", None)
        if stats is None:
            stats = getattr(getattr(self, "mesh_data", None), "stats", None)
        self.stats = stats
        t = cfg.train
        common = dict(normalization=cfg.data.normalization, j_regressor=jr,
                      stats=stats, process_slice=self.process_slice)
        self.train_loader = BatchLoader(
            self.data["train"], t.batch_train, shuffle=cfg.data.shuffle,
            seed=t.seed, drop_last=True, **common)
        self.interp_loader = BatchLoader(
            self.data["train"], t.batch_interp, shuffle=cfg.data.shuffle,
            seed=t.seed + 101, drop_last=True, **common)
        self.val_loader = BatchLoader(
            self.data["val"], t.batch_test, shuffle=False, seed=0,
            pad_final=True, **common)
        self.test_loader = BatchLoader(
            self.data["test"], t.batch_test, shuffle=False, seed=0,
            pad_final=True, **common)

    def _maybe_stage_device_data(self):
        """Stage array-backed splits into device HBM and swap the loaders
        for on-device batch materialization (data.device_data) — zero
        per-step host→device traffic.  cfg.data.device_resident: True /
        False / 'auto' (on when everything fits the byte budget)."""
        mode = self.cfg.data.device_resident
        if mode is False or mode == "false":
            return
        loaders = {"train": self.train_loader, "interp": self.interp_loader,
                   "val": self.val_loader, "test": self.test_loader}
        sources = {id(ld.source): ld.source for ld in loaders.values()}
        supported = all(isinstance(s, ArraySource) for s in sources.values())
        total = sum(int(np.prod(s.verts.shape)) * 4
                    + (0 if s.measures is None
                       else int(np.prod(s.measures.shape)) * 4)
                    for s in sources.values())
        budget = float(self.cfg.data.device_resident_max_gb) * 1e9
        if not supported or total > budget:
            if mode is True or mode == "true":
                raise ValueError(
                    "data.device_resident=True but the dataset cannot be "
                    f"staged (array-backed={supported}, bytes={total:.3g} "
                    f"vs budget {budget:.3g}) — use the per-sample file "
                    "layout with device_resident=false, or raise "
                    "data.device_resident_max_gb")
            return
        from ..data.device_data import DeviceBatchLoader, DeviceDataSource
        staged = {
            sid: DeviceDataSource(
                src.verts, src.measures, self.cfg.data.normalization,
                j_regressor=self.assets.j_regressor, stats=self.stats,
                mesh=self.mesh, batch_shard=self.batch_shard,
                # precomputed per-sample GT loss inputs (edge lengths,
                # part volumes) — pure data functions, staged once
                gt_faces=np.asarray(self.tables.faces),
                gt_face_part_mask=np.asarray(self.tables.face_part_mask))
            for sid, src in sources.items()}
        self.device_data = staged
        self.train_loader = DeviceBatchLoader(
            self.train_loader, staged[id(self.train_loader.source)])
        self.interp_loader = DeviceBatchLoader(
            self.interp_loader, staged[id(self.interp_loader.source)])
        self.val_loader = DeviceBatchLoader(
            self.val_loader, staged[id(self.val_loader.source)])
        self.test_loader = DeviceBatchLoader(
            self.test_loader, staged[id(self.test_loader.source)])

    # --- checkpoint -------------------------------------------------------------
    def _ckpt_dir(self):
        return os.path.join(self.workdir, "checkpoints")

    def _resume(self, resume_dir: str, finetune: bool):
        like = {"params": self.params, "opt_state": self.opt_state,
                "epoch": 0, "step": 0}
        state, _ = restore_checkpoint(resume_dir, like=like)
        self.params = state["params"]
        if not finetune:
            self.opt_state = state["opt_state"]
            self.start_epoch = int(state["epoch"]) + 1
            self.global_step = int(state["step"])

    def _resume_torch(self, path: str, finetune: bool):
        """Continue training from a reference `.pth.tar`: weights always;
        Adam moments + bias-correction count + lr-schedule position unless
        finetune (reference main.py:277-292 semantics — finetune loads
        weights only and restarts from epoch 1)."""
        from ..utils.import_torch import load_reference_training_state
        params, opt_state, epoch = load_reference_training_state(
            path, self.model, self.optimizer, self.steps_per_epoch,
            lr_decay=self.cfg.train.lr_decay)
        self.params = params
        if finetune:
            return
        if opt_state is None:
            raise ValueError(
                f"{path} carries no optimizer state — pass "
                "train.finetune=True to start a fresh schedule from its "
                "weights")
        self.opt_state = opt_state
        self.start_epoch = epoch + 1
        self.global_step = epoch * self.steps_per_epoch

    def save(self, epoch: int):
        save_checkpoint(self._ckpt_dir(), epoch, {
            "params": self.params, "opt_state": self.opt_state,
            "epoch": epoch, "step": self.global_step},
            max_to_keep=self.cfg.train.ck_keep)

    # --- steps ------------------------------------------------------------------
    def _get_step(self, epoch: int, variant: str):
        flags = flags_for_epoch(self.cfg.train, epoch)
        key = (flags, variant)
        if key not in self._step_cache:
            if self.is_part_model:
                self._step_cache[key] = make_train_step(
                    self.model, self.tables, self.optimizer, flags, variant)
            else:
                self._step_cache[key] = make_baseline_train_step(
                    self.model, self.tables, self.optimizer, flags)
        return self._step_cache[key]

    def _put(self, batch: dict) -> dict:
        # same placement policy as the prefetch pipeline (one code path)
        from ..data.dataset import place_batch
        return place_batch(batch, self.batch_shard)

    @staticmethod
    def _step_view(batch: dict) -> dict:
        """The device-array subset a jitted step consumes — host-side ids
        (idx/global_idx/pad) stay out of the jit pytree (they differ across
        processes in multi-host runs).  The precomputed GT loss inputs ride
        along so the step loop runs the same program the epoch scan runs
        (scan ≡ step-loop trajectory equality is a tested invariant)."""
        return {k: batch[k]
                for k in ("verts", "measure", "gt_face_edges",
                          "gt_part_vols") if k in batch}

    def _host(self, arr) -> np.ndarray:
        """Read a (possibly non-fully-addressable) device array on the host."""
        if self.n_processes > 1:
            from ..parallel.mesh import fully_replicate
            return np.asarray(fully_replicate(arr, self.mesh))
        return np.asarray(arr)

    def _interp_measure(self, interp_b: dict):
        """Host view of the interp batch's measures for the edit sampler —
        only edit_mode='exc' reads them (np.flip(measure)/measure), and in
        multi-host runs that needs the GLOBAL rows gathered."""
        m = interp_b.get("measure")
        if m is None or self.cfg.train.edit_mode != "exc":
            return m
        return self._host(m)

    def _masked_sum(self, values, valid):
        """Sum of per-sample values over the valid (non-padded) rows, plus
        the valid count — computed jitted so it works on globally sharded
        eval batches.  Returns DEVICE scalars: callers accumulate on
        device and fetch once at the end (each float() of a device scalar
        costs a remote round-trip on the tunnel)."""
        if not hasattr(self, "_masked_sum_fn"):
            self._masked_sum_fn = jax.jit(
                lambda x, m: (jnp.sum(x * m), jnp.sum(m)))
        return self._masked_sum_fn(values, valid)

    # --- main loop ---------------------------------------------------------------
    def dump_part_template(self):
        """Part-colored template OBJ visual spot-check at train start
        (reference main.py:132-158)."""
        from ..data.assets import part_color_map
        from ..topology.obj_io import save_obj
        v = self.assets.template_verts
        colors = part_color_map(self.assets.part_dict, len(v))
        save_obj(os.path.join(self.workdir, "samples", "template_parts.obj"),
                 v, self.assets.template_faces, vert_colors=colors)

    def _dump_train_params(self):
        """Write the full resolved config (+ code revision when available)
        to checkpoints/train_params.txt at train start — the reference's
        run-provenance mechanism (main.py:273-275); final metrics are
        appended to the same file by export_predictions.  Once per Trainer
        (segmented fit() drivers call fit repeatedly)."""
        import json
        import subprocess

        if getattr(self, "_params_dumped", False):
            return
        self._params_dumped = True

        sha = None
        try:
            sha = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
                timeout=5, cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout.strip() or None
        except Exception:
            pass
        with open(os.path.join(self._ckpt_dir(), "train_params.txt"),
                  "a") as f:
            f.write(json.dumps({"git_sha": sha,
                                "start_epoch": self.start_epoch,
                                "config": self.cfg.to_dict()},
                               indent=2, default=str) + "\n")

    def fit(self, n_epochs: int | None = None):
        cfg = self.cfg
        n_epochs = n_epochs or cfg.train.n_epochs
        if len(self.train_loader) == 0:
            raise ValueError(
                f"train split has {len(self.data['train'])} samples — fewer "
                f"than batch_train={cfg.train.batch_train} (drop_last)")
        if self.is_part_model and len(self.interp_loader) == 0:
            # cycle() over an empty loader would spin forever
            raise ValueError(
                f"train split has {len(self.data['train'])} samples — fewer "
                f"than batch_interp={cfg.train.batch_interp} (drop_last)")
        if self._is_main:
            self._dump_train_params()
        if self.start_epoch == 1 and cfg.train.save_recons and self._is_main:
            self.dump_part_template()
        use_scan = self._epoch_scan_ok()
        epoch = self.start_epoch
        while epoch <= n_epochs:
            t0 = time.time()
            if use_scan:
                # train.scan_epochs > 1 fuses consecutive epochs into ONE
                # lax.scan dispatch (clipped at every flag-change /
                # val / checkpoint / sample boundary) — on a remote-tunnel
                # host the per-dispatch overhead (~0.3 s) otherwise
                # dominates small fast-recipe epochs
                e1 = self._scan_chunk_end(epoch, n_epochs)
                tlosses, metrics, last_batch = self._run_scan_chunk(
                    epoch, e1)
            else:
                e1 = epoch
                # per-epoch deterministic state: the edit-spec RNG and the
                # interp/exc schedule are pure functions of the epoch
                # number, so resume-at-E replays the uninterrupted run's
                # epoch E exactly (the scan path does the same per chunked
                # epoch inside _run_scan_chunk)
                self.train_loader.set_epoch(epoch)
                self.sampler.reseed(epoch)
                interp_iter = self.interp_loader.cycle(anchor=epoch)
                tl, metrics, last_batch = self._run_epoch_steps(
                    epoch, interp_iter)
                tlosses = [tl]
            if self._is_main:
                self.logger.log(self.global_step, metrics)
            sec_per_epoch = (time.time() - t0) / len(tlosses)
            for i, e in enumerate(range(epoch, e1 + 1)):
                vloss = None
                if e == e1 and (e % max(cfg.train.val_every, 1) == 0
                                or e == n_epochs):
                    vloss = self.validate()
                if self._is_main:
                    ep_metrics = {"epoch_train": tlosses[i]}
                    if vloss is not None:
                        ep_metrics["epoch_val"] = vloss
                    self.logger.log(e, ep_metrics, prefix="epoch")
                    vtxt = "-" if vloss is None else f"{vloss:.6f}"
                    print(f"epoch {e} | tr {tlosses[i]:.6f} "
                          f"| val {vtxt} | {sec_per_epoch:.1f}s",
                          flush=True)
                if e % cfg.train.ck_frequency == 0:
                    self.save(e)
                if (cfg.train.save_recons and e % 50 == 0
                        and last_batch is not None):
                    self._dump_sample(e, last_batch)
            epoch = e1 + 1
        if self.trace_window is not None:
            self.trace_window.close()
        return self

    def _scan_chunk_end(self, e0: int, n_epochs: int) -> int:
        """Largest epoch e1 >= e0 the scan may fuse through: bounded by
        train.scan_epochs and clipped so the chunk never CROSSES an epoch
        that needs host action afterwards (checkpoint save, sample dump,
        val pass) or a loss-gate flag change (different compiled step)."""
        t = self.cfg.train
        e1 = min(e0 + max(t.scan_epochs, 1) - 1, n_epochs)
        f0 = flags_for_epoch(t, e0)
        e = e0
        while e < e1:
            # the boundary test applies to the CURRENT epoch — including
            # e0 itself — before extending past it: a chunk that crossed a
            # boundary would save a checkpoint labeled with the boundary
            # epoch but holding end-of-chunk params, and skip the
            # boundary's validation (fit() only validates at e == e1)
            if (e % t.ck_frequency == 0
                    or e % max(t.val_every, 1) == 0
                    or (t.save_recons and e % 50 == 0)):
                break
            if flags_for_epoch(t, e + 1) != f0:
                break
            e += 1
        return e

    def _run_epoch_steps(self, epoch: int, interp_iter):
        """One epoch as a Python loop of jitted steps (the general path:
        host data, multi-host, profiling windows, baseline model)."""
        cfg = self.cfg
        # per-step losses stay ON DEVICE until the epoch ends: a float()
        # here would block the host on every step (measured ~47 ms/step
        # of pipeline stall at the paper-recipe batch 4)
        step_losses, step_sizes = [], []
        last_batch = None
        metrics = {}
        batches = prefetch_to_device(iter(self.train_loader),
                                     size=cfg.data.prefetch,
                                     sharding=self.batch_shard)
        for batch in batches:
            if self.trace_window is not None:
                self.trace_window.tick(self.global_step)
            if self.is_part_model:
                interp_b = self._put(next(interp_iter))
                exc_b = self._put(next(interp_iter))
                variant = self.sampler.sample_exc_variant()
                spec = self.sampler.sample_interp(
                    epoch, interp_b["verts"].shape[0],
                    measure=self._interp_measure(interp_b))
                if self.n_processes > 1:
                    # every process draws the same spec (same seed);
                    # replicate it over the global mesh
                    from ..parallel.mesh import put_replicated
                    spec = put_replicated(spec, self.mesh)
                else:
                    spec = {k: jnp.asarray(v) for k, v in spec.items()}
                step = self._get_step(epoch, variant)
                self.params, self.opt_state, metrics = step(
                    self.params, self.opt_state, self._step_view(batch),
                    self._step_view(interp_b), self._step_view(exc_b),
                    spec)
            else:
                step = self._get_step(epoch, "ori")
                self.params, self.opt_state, metrics = step(
                    self.params, self.opt_state, self._step_view(batch))
            bs = batch["verts"].shape[0]
            step_losses.append(metrics["loss"])
            step_sizes.append(bs)
            self.global_step += 1
            if cfg.train.log_every and self._is_main and (
                    self.global_step % cfg.train.log_every == 0):
                # one transfer — the logger float()s per scalar, which on
                # the remote tunnel would cost a fetch round-trip each
                self.logger.log(self.global_step, jax.device_get(metrics))
            last_batch = batch

        losses_h = [float(v) for v in jax.device_get(step_losses)]
        epoch_tloss = (sum(v * b for v, b in zip(losses_h, step_sizes))
                       / max(sum(step_sizes), 1))
        return epoch_tloss, jax.device_get(metrics), last_batch

    # --- epoch-scan path --------------------------------------------------------
    def _epoch_scan_ok(self) -> bool:
        """Whole-epoch lax.scan applies when the data is device-resident in
        a single process with the part model and no per-step profiling
        hooks (train.epoch_scan turns it off)."""
        from ..data.device_data import DeviceBatchLoader
        return (self.cfg.train.epoch_scan
                and self.is_part_model
                and self.n_processes == 1
                and self.trace_window is None
                and isinstance(self.train_loader, DeviceBatchLoader)
                and isinstance(self.interp_loader, DeviceBatchLoader)
                and self.train_loader.source is self.interp_loader.source)

    def _get_scan_step(self, epoch: int, variant: str, n_steps: int):
        flags = flags_for_epoch(self.cfg.train, epoch)
        key = ("scan", flags, variant, n_steps)
        if key not in self._step_cache:
            self._step_cache[key] = make_epoch_scan_step(
                self.model, self.tables, self.optimizer, flags, variant,
                self.train_loader.source.batch_fn)
        return self._step_cache[key]

    def _run_scan_chunk(self, e0: int, e1: int):
        """Epochs e0..e1 (inclusive) as ONE jitted lax.scan dispatch over
        device-resident data: the host contributes the [K_total, B] index
        schedules and stacked edit specs; per-dispatch overhead is paid
        once per CHUNK.  Each epoch's schedule/RNG state is built exactly
        as the per-epoch paths build it (set_epoch + reseed + anchored
        meta_cycle), so the trajectory is identical for any chunking."""
        cfg = self.cfg
        src = self.train_loader.source
        exc_dyn = self.sampler.exc_mode == "ori_or_m"
        host_meas = getattr(self.interp_loader.loader.source, "measures",
                            None)

        metas, idx_in, idx_ex, specs, epoch_of_step = [], [], [], [], []
        static_variant = None
        for e in range(e0, e1 + 1):
            self.train_loader.set_epoch(e)
            self.sampler.reseed(e)
            interp_meta_iter = self.interp_loader.meta_cycle(anchor=e)
            e_metas = list(self.train_loader.loader.iter_indices())
            metas.extend(e_metas)
            for _ in range(len(e_metas)):
                mi = next(interp_meta_iter)
                me = next(interp_meta_iter)
                idx_in.append(mi["global_idx"])
                idx_ex.append(me["global_idx"])
                variant = self.sampler.sample_exc_variant()
                static_variant = variant
                measure = None
                if cfg.train.edit_mode == "exc":
                    measure = np.asarray(host_meas)[mi["global_idx"]]
                spec = self.sampler.sample_interp(
                    e, len(mi["global_idx"]), measure=measure)
                if exc_dyn:
                    spec["exc_is_ori"] = np.float32(variant == "ori")
                specs.append(spec)
                epoch_of_step.append(e)
        k = len(metas)
        idx_tr = np.stack([m["global_idx"] for m in metas]).astype(np.int32)
        idx_in = np.stack(idx_in).astype(np.int32)
        idx_ex = np.stack(idx_ex).astype(np.int32)
        specs_st = {name: np.stack([s[name] for s in specs])
                    for name in specs[0]}

        def put_stacked(x, batch_major):
            # [K, B, ...] inputs shard on the batch axis so the scanned
            # per-step slices inherit the DP layout; which arrays are
            # batch-major is decided by NAME (only the index schedules and
            # a_full), never by matching dim sizes — a spec whose non-batch
            # axis-1 length coincides with a batch size must stay replicated
            if self.mesh is not None and batch_major:
                from jax.sharding import NamedSharding, PartitionSpec
                spec = PartitionSpec(*((None, self.mesh.axis_names[0])
                                       + (None,) * (x.ndim - 2)))
                return jax.device_put(x, NamedSharding(self.mesh, spec))
            return jnp.asarray(x)

        step = self._get_scan_step(
            e0, "dynamic" if exc_dyn else static_variant, k)
        self.params, self.opt_state, ms = step(
            self.params, self.opt_state, src.verts, src.measures, src.gt,
            put_stacked(idx_tr, True), put_stacked(idx_in, True),
            put_stacked(idx_ex, True),
            {name: put_stacked(v, name == "a_full")
             for name, v in specs_st.items()})
        self.global_step += k

        # ONE host transfer for every per-step metric: the logger float()s
        # each scalar, and on the remote tunnel a per-scalar fetch costs
        # ~25 ms — 13 metrics × per-epoch chunks read ~0.3 s/epoch of pure
        # fetch latency before this batching (measured: the paper recipe
        # logged 2.15 s/epoch while the probe's single-fetch path ran 1.82)
        ms_h = jax.device_get(ms)
        if cfg.train.log_every and self._is_main:
            base = self.global_step - k
            for s in range(k):
                if (base + s + 1) % cfg.train.log_every == 0:
                    self.logger.log(base + s + 1,
                                    {n: v[s] for n, v in ms_h.items()})
        loss_h = np.asarray(ms_h["loss"])
        eps = np.asarray(epoch_of_step)
        tlosses = [float(loss_h[eps == e].mean())
                   for e in range(e0, e1 + 1)]
        metrics_last = {n: v[-1] for n, v in ms_h.items()}
        if "gnorm" in ms_h:
            # a chunk fuses up to scan_epochs × steps-per-epoch steps into
            # one dispatch; for the stability diagnostic the MAX raw grad
            # norm across the chunk is the signal (a last-step value would
            # hide the spike that NaNs a near-the-edge recipe mid-chunk)
            metrics_last["gnorm"] = ms_h["gnorm"].max()
        last_batch = (src.take(metas[-1])
                      if cfg.train.save_recons and e1 % 50 == 0 else None)
        return tlosses, metrics_last, last_batch

    def _get_eval_step(self, mm_constant: float = 1000.0):
        """Jitted eval step, cached per mm_constant (a single cached step
        previously ignored a different mm_constant silently)."""
        key = float(mm_constant)
        if key not in self._eval_steps:
            self._eval_steps[key] = make_eval_step(self.model, self.tables,
                                                   mm_constant)
        return self._eval_steps[key]

    def validate(self) -> float:
        step = self._get_eval_step()
        # accumulate ON DEVICE; one fetch for the whole pass (each float()
        # of a device scalar is a remote round-trip — 2 per batch added up
        # to ~0.2 s/epoch of the paper recipe's val-every-epoch wall)
        total, count = None, None
        for batch in self.val_loader:
            batch = self._put(batch)
            out = step(self.params, self._step_view(batch))
            s, c = self._masked_sum(out["l1"], batch["valid"])
            total = s if total is None else total + s
            count = c if count is None else count + c
        if total is None:
            return 0.0
        total_h, count_h = jax.device_get((total, count))
        return float(total_h) / max(float(count_h), 1.0)

    def evaluate(self, loader=None, mm_constant: float = 1000.0,
                 unnormalize: bool | None = None):
        """Full test-set eval: returns (predictions, z, z_kps, inputs,
        mean L1, mean per-vertex mm error) — reference test_funcs.py:61-110.

        `unnormalize` (default: auto — on whenever the normalization string
        contains a SCALING mode, 'gass' or 'normal') inverts the scaling
        before the metrics and returned arrays, so the mm number is true
        millimeters.  The reference defines this inverse (`unnormal`,
        test_funcs.py:9-15) but never calls it — its unnormal_flag is dead —
        so pass unnormalize=False to reproduce the reference's
        normalized-space metric exactly."""
        from ..data.dataset import unnormalize_batch
        loader = loader or self.test_loader
        norm = self.cfg.data.normalization
        if unnormalize is None:
            unnormalize = ("gass" in norm) or ("normal" in norm)
        if unnormalize and self.stats is None:
            raise ValueError("unnormalize=True needs dataset stats "
                             "(train with gass/normal normalization)")
        step = self._get_eval_step(mm_constant)
        preds, zs, zkps, txs = [], [], [], []
        l1_sum, l2_sum, count = 0.0, 0.0, 0
        for batch in loader:
            batch = self._put(batch)
            out = step(self.params, self._step_view(batch))
            n_valid = batch["verts"].shape[0] - batch.get("pad", 0)
            rec = self._host(out["rec"])[:n_valid]
            tx = self._host(batch["verts"])[:n_valid]
            if unnormalize:
                idx = np.asarray(batch["global_idx"][:n_valid])
                rec = np.concatenate(
                    [unnormalize_batch(rec[:, :-1], norm, self.stats, idx),
                     rec[:, -1:]], axis=1)
                tx = np.concatenate(
                    [unnormalize_batch(tx[:, :-1], norm, self.stats, idx),
                     tx[:, -1:]], axis=1)
                d = rec[:, :-1] - tx[:, :-1]
                l1_sum += float(np.sum(np.mean(np.abs(d), axis=(1, 2))))
                l2_sum += float(np.sum(np.mean(np.sqrt(np.sum(
                    (d * mm_constant) ** 2, axis=2)), axis=1)))
            else:
                l1_sum += float(self._masked_sum(out["l1"],
                                                 batch["valid"])[0])
                l2_sum += float(self._masked_sum(out["l2_mm"],
                                                 batch["valid"])[0])
            preds.append(rec)
            zs.append(self._host(out["z"])[:n_valid])
            zkps.append(self._host(out["z_kps"])[:n_valid])
            txs.append(tx)
            count += n_valid
        return (np.concatenate(preds), np.concatenate(zs),
                np.concatenate(zkps), np.concatenate(txs),
                l1_sum / count, l2_sum / count)

    def export_predictions(self, out_dir: str | None = None):
        out_dir = out_dir or os.path.join(self.workdir, "predictions")
        os.makedirs(out_dir, exist_ok=True)
        preds, z, z_kps, tx, l1, l2 = self.evaluate()
        np.save(os.path.join(out_dir, "predictions.npy"), preds)
        np.save(os.path.join(out_dir, "z_s.npy"), z)
        np.save(os.path.join(out_dir, "z_kps_s.npy"), z_kps)
        np.save(os.path.join(out_dir, "tx_s.npy"), tx)
        with open(os.path.join(self.workdir, "checkpoints",
                               "train_params.txt"), "a") as f:
            f.write(f"autoencoder: L1 loss {l1}\n")
            f.write(f"autoencoder: euclidean distance in mm {l2}\n")
        return preds, z, z_kps, tx, l1, l2

    def _dump_sample(self, epoch: int, batch: dict):
        """GT + reconstruction OBJ spot-dumps (train_funcs.py:459-470)."""
        from ..topology.obj_io import save_obj
        res = self._get_eval_step()(self.params, self._step_view(batch))
        # _host is collective (all processes must participate) — gate only
        # the file writes on the main process
        gt = self._host(batch["verts"])[0, :-1]
        rec = self._host(res["rec"])[0, :-1]
        if not self._is_main:
            return
        sdir = os.path.join(self.workdir, "samples")
        save_obj(os.path.join(sdir, f"epoch{epoch}_GT.obj"), gt,
                 self.assets.template_faces)
        save_obj(os.path.join(sdir, f"epoch{epoch}_rec.obj"), rec,
                 self.assets.template_faces)

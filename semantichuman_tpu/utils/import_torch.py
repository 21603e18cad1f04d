"""Import reference PyTorch checkpoints into framework params.

The reference saves `{epoch, autoencoder_state_dict, optimizer_state_dict,
scheduler_state_dict}` in `.pth.tar` files (train_funcs.py:450-455).  This
module maps `autoencoder_state_dict` onto our parameter pytree so trained
reference checkpoints can be evaluated / edited in the TPU framework.

Reference key layout (models.py:55-310):
  conv.{i}.conv.{weight,bias}             encoder SpiralConvs (ModuleList
                                          order: per level, optional extra
                                          conv then main conv)
  dconv.{i}.conv.{weight,bias}            decoder SpiralConvs
  fc_latent_enc_list.{p}.{weight,bias}    17 per-part shape-latent heads
  fc_latent_dec_list.{p}.{weight,bias}    17 per-part decoder heads
  kps_enc_list.{p}.{weight,bias}          17 per-part keypoint encoders
  fc_latent_enc / fc_latent_dec           neural3DMM baseline bottleneck

torch `nn.Linear.weight` is [out, in]; ours is [in, out] — transposed here.
Per-part heads are zero-padded into the framework's batched [P, ...] layout;
the pads multiply the zeroed dummy row so results are unchanged.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np(t):
    """torch tensor | array-like -> float32 numpy array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _strip_prefix(state: dict) -> dict:
    """Drop a DataParallel-style 'module.' prefix if present."""
    if state and all(k.startswith("module.") for k in state):
        return {k[len("module."):]: v for k, v in state.items()}
    return dict(state)


def _conv_stack(state: dict, name: str, n: int) -> list[dict]:
    out = []
    for i in range(n):
        w = _np(state[f"{name}.{i}.conv.weight"]).T     # [S*C_in, C_out]
        b = _np(state[f"{name}.{i}.conv.bias"])
        out.append({"w": w, "b": b})
    return out


def import_part_ae_state(state: dict, model) -> dict:
    """Reference `SpiralAutoencoder_multiz_partkps` state dict -> PartAE
    params pytree (model: models.part_ae.PartAE)."""
    state = _strip_prefix(state)
    params = {
        "conv": _conv_stack(state, "conv", len(model.enc_plan)),
        "dconv": _conv_stack(state, "dconv", len(model.dec_plan)),
    }
    nz, nk, c = model.latent_size, model.kps_latent_size, model.enc_out_c
    c0 = model.dec_in_c
    P, n_max, g_max = model.n_parts, model.n_max, model.g_max

    w_enc = np.zeros((P, n_max * c, nz), np.float32)
    b_enc = np.zeros((P, nz), np.float32)
    w_dec = np.zeros((P, nz + nk, n_max * c0), np.float32)
    b_dec = np.zeros((P, n_max * c0), np.float32)
    w_kps = np.zeros((P, g_max * 3, nk), np.float32)
    b_kps = np.zeros((P, nk), np.float32)
    for p in range(P):
        n_p = model.part_sizes[p]
        g_p = len(model.kps_index_list[p])
        we = _np(state[f"fc_latent_enc_list.{p}.weight"]).T   # [n_p*c, nz]
        if we.shape[0] != n_p * c:
            raise ValueError(
                f"part {p}: encoder head expects fan-in {n_p * c}, "
                f"checkpoint has {we.shape[0]} — part layout mismatch")
        w_enc[p, :n_p * c] = we
        b_enc[p] = _np(state[f"fc_latent_enc_list.{p}.bias"])
        wd = _np(state[f"fc_latent_dec_list.{p}.weight"]).T   # [nz+nk, n_p*c0]
        w_dec[p, :, :n_p * c0] = wd
        b_dec[p, :n_p * c0] = _np(state[f"fc_latent_dec_list.{p}.bias"])
        wk = _np(state[f"kps_enc_list.{p}.weight"]).T         # [g_p*3, nk]
        w_kps[p, :g_p * 3] = wk
        b_kps[p] = _np(state[f"kps_enc_list.{p}.bias"])

    params["enc_heads"] = {"w": w_enc, "b": b_enc}
    params["dec_heads"] = {"w": w_dec, "b": b_dec}
    params["kps_heads"] = {"w": w_kps, "b": b_kps}
    return {k: _to_jax(v) for k, v in params.items()}


def import_spiral_ae_state(state: dict, model) -> dict:
    """Reference `SpiralAutoencoder` (neural3DMM) state dict -> SpiralAE
    params."""
    state = _strip_prefix(state)
    params = {
        "conv": _conv_stack(state, "conv", len(model.enc_plan)),
        "dconv": _conv_stack(state, "dconv", len(model.dec_plan)),
        "fc_enc": {"w": _np(state["fc_latent_enc.weight"]).T,
                   "b": _np(state["fc_latent_enc.bias"])},
        "fc_dec": {"w": _np(state["fc_latent_dec.weight"]).T,
                   "b": _np(state["fc_latent_dec.bias"])},
    }
    return {k: _to_jax(v) for k, v in params.items()}


def _to_jax(tree):
    if isinstance(tree, dict):
        return {k: _to_jax(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_jax(v) for v in tree]
    return jnp.asarray(tree)


def load_reference_checkpoint(path: str, model) -> tuple[dict, int]:
    """Load a reference `.pth.tar` checkpoint file -> (params, epoch).
    Requires torch for unpickling."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("autoencoder_state_dict", ckpt)
    epoch = int(ckpt.get("epoch", 0))
    if hasattr(model, "kps_encode"):
        return import_part_ae_state(state, model), epoch
    return import_spiral_ae_state(state, model), epoch


# --- optimizer / scheduler state import --------------------------------------

def _moment_dicts(opt_sd: dict, params_sd: dict):
    """torch `optim.state_dict()` -> ({name: exp_avg}, {name: exp_avg_sq},
    step_count).

    The state dict's `state` keys are integer positions in the flattened
    param_groups parameter order, which for the reference equals
    `model.parameters()` order — and the reference model registers NO
    buffers (models.py:10-32 keeps spiral tables as plain attributes), so
    that order is exactly the key order of `autoencoder_state_dict`
    (`params_sd`).  Each moment tensor's shape is cross-checked against
    its parameter's so an order mismatch (custom param_groups, requires_grad
    filtering) fails loudly instead of resuming with swapped moments."""
    state = opt_sd.get("state") or {}
    names = list(params_sd)
    exp_avg, exp_avg_sq, steps = {}, {}, []
    for idx, st in state.items():
        if int(idx) >= len(names):
            raise ValueError(
                f"optimizer state index {idx} out of range for "
                f"{len(names)} model parameters — checkpoint optimizer "
                "does not cover the model's parameter list")
        name = names[int(idx)]
        ea, eas = _np(st["exp_avg"]), _np(st["exp_avg_sq"])
        want = tuple(params_sd[name].shape)
        if ea.shape != want or eas.shape != want:
            raise ValueError(
                f"optimizer moment shape {ea.shape} does not match "
                f"parameter '{name}' shape {want} — param order mismatch "
                "between optimizer_state_dict and autoencoder_state_dict")
        exp_avg[name] = ea
        exp_avg_sq[name] = eas
        s = st.get("step", 0)
        steps.append(int(s.item() if hasattr(s, "item") else s))
    if len(set(steps)) > 1:
        raise ValueError(
            f"per-parameter Adam step counts differ ({sorted(set(steps))}) "
            "— checkpoint not from a plain full-parameter training run")
    return exp_avg, exp_avg_sq, (steps[0] if steps else 0)


def _build_optax_state(optimizer, params, mu, nu, adam_count: int,
                       schedule_count: int):
    """Assemble our optax chain state (train.optim.make_optimizer:
    add_decayed_weights -> scale_by_adam -> scale_by_learning_rate) from
    imported Adam moments.

    adam_count drives bias correction and must be the torch step count
    (optax count == torch `step` after the same number of updates: both
    use count+1 in the correction of the NEXT update).  schedule_count
    positions the per-epoch lr decay and is epoch * OUR steps_per_epoch —
    the two differ whenever the dataset sizes differ."""
    import jax.numpy as jnp
    import optax

    state = optimizer.init(params)

    def replace(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=jnp.asarray(adam_count, jnp.int32),
                mu=_to_jax(mu), nu=_to_jax(nu))
        if isinstance(s, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(
                count=jnp.asarray(schedule_count, jnp.int32))
        return s

    def rebuild(st):
        # train.skip_nonfinite wraps the whole chain in apply_if_finite;
        # its state is a NamedTuple (NOT the chain tuple — iterating it
        # would walk its fields), so recurse into inner_state explicitly
        if isinstance(st, optax.ApplyIfFiniteState):
            return st._replace(inner_state=rebuild(st.inner_state))
        return tuple(replace(s) for s in st)

    return rebuild(state)


def load_reference_training_state(path: str, model, optimizer,
                                  steps_per_epoch: int, lr_decay: float
                                  | None = None):
    """Load a reference `.pth.tar` for TRAINING RESUME: -> (params,
    opt_state | None, epoch).

    The reference restores `optimizer_state_dict` + `scheduler_state_dict`
    and continues from epoch+1 (main.py:277-292; saved at
    train_funcs.py:450-455).  Here the torch Adam `exp_avg`/`exp_avg_sq`
    moments map onto optax's mu/nu through the SAME per-tensor layout
    transform as the weights (transposes + zero-padded batched part heads
    — zero pads are exact: pad weights receive zero gradient, so their
    moments are identically zero), the torch `step` becomes the Adam
    bias-correction count, and the checkpoint epoch positions our
    per-epoch lr schedule.  opt_state is None when the checkpoint carries
    no optimizer state (weights-only / finetune checkpoints).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    auto_sd = _strip_prefix(ckpt.get("autoencoder_state_dict", ckpt))
    part = hasattr(model, "kps_encode")
    import_fn = import_part_ae_state if part else import_spiral_ae_state
    params = import_fn(auto_sd, model)
    epoch = int(ckpt.get("epoch", 0))

    sched_sd = ckpt.get("scheduler_state_dict") or {}
    if lr_decay is not None and "gamma" in sched_sd:
        gamma = float(sched_sd["gamma"])
        if abs(gamma - lr_decay) > 1e-9:
            import warnings
            warnings.warn(
                f"checkpoint scheduler gamma {gamma} != configured "
                f"train.lr_decay {lr_decay}; resuming with the configured "
                "value", stacklevel=2)

    opt_sd = ckpt.get("optimizer_state_dict") or {}
    opt_state = None
    if opt_sd.get("state"):
        exp_avg, exp_avg_sq, step_count = _moment_dicts(opt_sd, auto_sd)
        # params torch never stepped (no grad — e.g. heads of parts with
        # zero coarse vertices) have NO optimizer entry; their moments are
        # identically zero, which is also what optax produces for them
        for name, t in auto_sd.items():
            if name not in exp_avg:
                z = np.zeros_like(_np(t))
                exp_avg[name] = z
                exp_avg_sq[name] = z
        mu = import_fn(exp_avg, model)
        nu = import_fn(exp_avg_sq, model)
        opt_state = _build_optax_state(optimizer, params, mu, nu, step_count,
                                       epoch * steps_per_epoch)
    return params, opt_state, epoch

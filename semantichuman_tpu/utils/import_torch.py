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

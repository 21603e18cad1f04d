"""Jitted train/eval steps.

One compiled program per (loss-gate, exc-variant) combination covers the
whole step — forward, all loss branches, backward, optimizer — with zero
host round-trips (the reference crosses host↔device per sample inside its
edge regularizer and rebuilds edit targets in Python each step,
train_funcs.py:137-144,153-310).

Static inputs (trace-time): model, loss tables, gate flags, exc variant.
Dynamic inputs: params, opt_state, batches, host-sampled edit spec arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..constants import KPS_KEEP, NEWSKL_KEEP, SKL_KEEP
from ..ops.skeleton import kps2skl, skl2kps
from . import losses as L


@dataclass(frozen=True)
class StepFlags:
    """Static loss gates + shaping knobs (from TrainConfig at a given epoch)."""
    edgereg: bool = True
    zpartreg: bool = True
    interp: bool = True
    exc: bool = True
    vol: bool = True
    editskl: bool = False
    relat: bool = True
    leafkeep: bool = True
    w_mode: str = "threshold"
    w_threshold: float = 0.8
    w_part_mode: str = "1/K"
    # None = auto: the VMEM-fused Pallas distance loss when the backend
    # compiles it (ops.pallas.part_dist_pallas), else the jnp path
    fused_dist: bool | None = None
    edgereg_w: float = 1e-2
    zpartreg_w: float = 1e-2
    vol_w: float = 1e-2
    interp_kps_w: float = 1.0
    interp_euc_w: float = 1e-2
    exc_kps_w: float = 1.0
    exc_euc_w: float = 1e-2


def flags_for_epoch(cfg_train, epoch: int) -> StepFlags:
    """Reference gating: a term is active once epoch > its *_epoch threshold
    and its weight is positive (train_funcs.py:137,145,153,286,323)."""
    t = cfg_train
    return StepFlags(
        edgereg=epoch > t.edgereg_epoch and t.edgereg_w > 0,
        zpartreg=epoch > t.zpartreg_epoch and t.zpartreg_w > 0,
        interp=epoch > t.interp_epoch,
        exc=epoch > t.exc_epoch,
        vol=epoch > t.vol_epoch and t.vol_w > 0,
        editskl=t.editskl_flag, relat=t.relat_flag,
        leafkeep=t.leafkeep_flag, w_mode=t.w_mode,
        w_threshold=t.w_threshold, w_part_mode=t.w_part_mode,
        edgereg_w=t.edgereg_w, zpartreg_w=t.zpartreg_w, vol_w=t.vol_w,
        interp_kps_w=t.interp_kps_w, interp_euc_w=t.interp_euc_w,
        exc_kps_w=t.exc_kps_w, exc_euc_w=t.exc_euc_w)


def _edited_kps(kps_full, skl_len_factor):
    """Scale kept-bone lengths by skl_len_factor, re-integrate to keypoints
    (the interp branch's editskl path, train_funcs.py:163-168)."""
    skl = kps2skl(kps_full, "ori_m")
    skl = skl.at[:, :, 3].multiply(skl_len_factor[None, :])
    return skl2kps(skl, "ori_m")


def _ori_swapped(skl):
    keep = jnp.asarray(NEWSKL_KEEP)
    return skl.at[:, keep, :3].set(jnp.flip(skl[:, keep, :3], axis=0))


def _m_swapped(skl):
    keep = jnp.asarray(SKL_KEEP)
    return skl.at[:, keep, 3].set(jnp.flip(skl[:, keep, 3], axis=0))


def _exchanged_kps(kps_full, variant: str, is_ori=None):
    """Pair samples by flipping the batch and swap skeleton orientation or
    bone length between pairs (the exc branch, train_funcs.py:297-316).

    variant='dynamic' selects ori-vs-m per call from the traced scalar
    `is_ori` (the epoch-scan path, where the 'ori_or_m' coin flip varies
    across scanned steps inside ONE compiled program); both swaps are a
    few [B, 35, 4] array ops, so computing both and selecting is cheap."""
    if variant == "ori_m":
        return jnp.flip(kps_full, axis=0)[:, jnp.asarray(KPS_KEEP)]
    skl = kps2skl(kps_full, "ori_m")
    if variant == "ori":
        skl = _ori_swapped(skl)
    elif variant == "m":
        skl = _m_swapped(skl)
    elif variant == "dynamic":
        skl = jnp.where(is_ori > 0, _ori_swapped(skl), _m_swapped(skl))
    else:
        raise ValueError(f"unknown exc variant {variant!r}")
    return skl2kps(skl, "ori_m")


def make_loss_fn(model, tables: L.LossTables, flags: StepFlags,
                 exc_variant: str = "ori"):
    """Build the full multi-branch loss closure (PartAE)."""
    jreg = jnp.asarray(tables.j_regressor)
    faces = jnp.asarray(tables.faces)
    kps_keep = jnp.asarray(tables.kps_keep)
    # resolve the fused-distance-loss choice HERE, outside any trace: the
    # availability probe must not run while the step itself is being traced
    # (a deferred pallas lowering error would make it misreport)
    fused_dist = flags.fused_dist
    if fused_dist is None:
        from ..ops.pallas.part_dist_pallas import (bucket_n_pads,
                                                   fused_dist_available)
        # probe the ACTUAL tile sizes this model's parts will launch —
        # Mosaic failures are shape-specific, not only capacity-bound
        fused_dist = fused_dist_available(bucket_n_pads(tables.part_indices))

    def loss_fn(params, batch, interp_batch, exc_batch, edit_spec):
        # The three branches (main rec, interp edit, skeleton exchange) share
        # the conv trunk, so their forward passes are FUSED: one encode and
        # one decode over the concatenated segments.  At the model's scale the
        # step is dispatch-bound, and this cuts trunk dispatches 3x (the
        # reference runs three sequential forwards, train_funcs.py:114-389).
        metrics = {}
        tx = batch["verts"]
        segs = [tx]
        kps_full = L.regress_kps(tx[:, :-1], jreg)
        enc_kps = [jnp.take(kps_full, kps_keep, axis=1)]

        if flags.interp:
            txi = interp_batch["verts"]
            kps_i = L.regress_kps(txi[:, :-1], jreg)
            if flags.editskl:
                newkps = _edited_kps(kps_i, edit_spec["skl_len_factor"])
            else:
                newkps = jnp.take(kps_i, kps_keep, axis=1)
            segs.append(txi)
            enc_kps.append(newkps)
        if flags.exc:
            txe = exc_batch["verts"]
            kps_e = L.regress_kps(txe[:, :-1], jreg)
            newkps_e = _exchanged_kps(kps_e, exc_variant,
                                      edit_spec.get("exc_is_ori"))
            segs.append(txe)
            enc_kps.append(newkps_e)

        sizes = [s.shape[0] for s in segs]
        offs = np.cumsum([0] + sizes)

        def split(arr):
            return [arr[offs[i]:offs[i + 1]] for i in range(len(sizes))]

        z_all, zk_all, dummy_all = model.encode(
            params, jnp.concatenate(segs, axis=0),
            jnp.concatenate(enc_kps, axis=0))
        z_segs, zk_segs, dummy_segs = (split(z_all), split(zk_all),
                                       split(dummy_all))
        z = z_segs[0]
        if flags.interp:
            zi = z_segs[1] * edit_spec["a_full"][:, :, None]
            z_segs[1] = zi
        rec_all = model.decode(params, jnp.concatenate(z_segs, axis=0),
                               jnp.concatenate(zk_segs, axis=0),
                               jnp.concatenate(dummy_segs, axis=0))
        rec_segs = split(rec_all)

        rec = rec_segs[0]
        rec_l = L.rec_loss(tx, rec)
        loss = rec_l
        metrics["rec"] = rec_l

        if flags.edgereg:
            e = L.edgereg_loss(tx[:, :-1], rec[:, :-1], faces,
                               gt_edges=batch.get("gt_face_edges"))
            loss = loss + flags.edgereg_w * e
            metrics["edgereg"] = e
        if flags.zpartreg:
            zr = L.zpartreg_loss(z, batch["measure"], flags.relat)
            loss = loss + flags.zpartreg_w * zr
            metrics["zpartreg"] = zr

        if flags.interp:
            rec_i = rec_segs[1]
            if flags.interp_kps_w > 0:
                kl = L.kps_consistency_loss(rec_i[:, :-1], newkps, jreg,
                                            kps_keep)
                loss = loss + flags.interp_kps_w * kl
                metrics["interp_kps"] = kl
            if flags.interp_euc_w > 0:
                el = L.weighted_distance_loss(
                    txi[:, :-1], rec_i[:, :-1], kps_i, tables,
                    a_full=edit_spec["a_full"],
                    edited_mask=edit_spec["edited_mask"],
                    n_edited=edit_spec["n_edited"],
                    w_mode=flags.w_mode, w_threshold=flags.w_threshold,
                    w_part_mode=flags.w_part_mode, relat=flags.relat,
                    leafkeep=flags.leafkeep, fused=fused_dist)
                loss = loss + flags.interp_euc_w * el
                metrics["interp_euc"] = el

        if flags.exc:
            rec_e = rec_segs[-1]
            if flags.vol and exc_variant == "ori":
                vl = L.volume_loss(txe[:, :-1], rec_e[:, :-1], tables,
                                   gt_vols=exc_batch.get("gt_part_vols"))
                loss = loss + flags.vol_w * vl
                metrics["vol"] = vl
            elif flags.vol and exc_variant == "dynamic":
                # reference applies the volume loss only on 'ori' steps
                # (train_funcs.py:323-333) — under the scanned coin flip
                # that gate becomes a traced weight; the logged metric is
                # gated too so scan-path curves match the step-loop path
                # (which reports no vol on 'm' steps)
                vl = L.volume_loss(txe[:, :-1], rec_e[:, :-1], tables,
                                   gt_vols=exc_batch.get("gt_part_vols"))
                loss = loss + flags.vol_w * edit_spec["exc_is_ori"] * vl
                metrics["vol"] = edit_spec["exc_is_ori"] * vl
            if flags.exc_kps_w > 0:
                kl = L.kps_consistency_loss(rec_e[:, :-1], newkps_e, jreg,
                                            kps_keep)
                loss = loss + flags.exc_kps_w * kl
                metrics["exc_kps"] = kl
            if flags.exc_euc_w > 0:
                el = L.weighted_distance_loss(
                    txe[:, :-1], rec_e[:, :-1], kps_e, tables,
                    w_mode=flags.w_mode, w_threshold=flags.w_threshold,
                    w_part_mode=flags.w_part_mode, relat=flags.relat,
                    leafkeep=flags.leafkeep, fused=fused_dist)
                loss = loss + flags.exc_euc_w * el
                metrics["exc_euc"] = el

        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


def make_train_step(model, tables: L.LossTables, optimizer,
                    flags: StepFlags, exc_variant: str = "ori",
                    donate: bool = True):
    """Returns jitted: (params, opt_state, batch, interp, exc, edit_spec)
    -> (params, opt_state, metrics)."""
    loss_fn = make_loss_fn(model, tables, flags, exc_variant)

    def step(params, opt_state, batch, interp_batch, exc_batch, edit_spec):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, interp_batch, exc_batch, edit_spec)
        # raw (pre-clip) gradient global-norm: the stability diagnostic
        # for near-the-edge large-batch recipes (train/optim.py grad_clip)
        metrics["gnorm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_baseline_loss_fn(model, tables: L.LossTables, flags: StepFlags):
    """neural3DMM baseline: reconstruction + edge regularizer only
    (reference: train_funcs.py:474-583)."""
    faces = jnp.asarray(tables.faces)

    def loss_fn(params, batch):
        tx = batch["verts"]
        rec, _z = model(params, tx)
        rec_l = L.rec_loss(tx, rec)
        loss = rec_l
        metrics = {"rec": rec_l}
        if flags.edgereg:
            e = L.edgereg_loss(tx[:, :-1], rec[:, :-1], faces,
                               gt_edges=batch.get("gt_face_edges"))
            loss = loss + flags.edgereg_w * e
            metrics["edgereg"] = e
        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


def make_baseline_train_step(model, tables, optimizer, flags: StepFlags,
                             donate: bool = True):
    loss_fn = make_baseline_loss_fn(model, tables, flags)

    def step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        metrics["gnorm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(model, tables: L.LossTables, mm_constant: float = 1000.0):
    """Per-batch eval metrics: mean-L1 and mean per-vertex Euclidean error in
    mm, dummy row excluded (reference: test_funcs.py:97-101)."""
    jreg = jnp.asarray(tables.j_regressor)
    kps_keep = jnp.asarray(tables.kps_keep)

    part_model = hasattr(model, "kps_encode")

    def step(params, batch):
        tx = batch["verts"]
        if part_model:
            kps = L.regress_kps(tx[:, :-1], jreg)
            rec, z, z_kps = model(params, tx, jnp.take(kps, kps_keep, axis=1))
        else:
            rec, z = model(params, tx)
            z_kps = jnp.zeros((tx.shape[0], 0, 0), tx.dtype)
        x, xr = tx[:, :-1], rec[:, :-1]
        # per-sample metrics so the caller can mask padded rows exactly
        l1 = jnp.mean(jnp.abs(xr - x), axis=(1, 2))
        l2mm = jnp.mean(jnp.sqrt(jnp.sum(
            ((xr - x) * mm_constant) ** 2, axis=2)), axis=1)
        return {"rec": rec, "z": z, "z_kps": z_kps, "l1": l1, "l2_mm": l2mm}

    return jax.jit(step)


def make_epoch_scan_step(model, tables: L.LossTables, optimizer,
                         flags: StepFlags, exc_variant: str, batch_fn,
                         donate: bool = True):
    """A WHOLE EPOCH of train steps as ONE jitted lax.scan program.

    With device-resident data the host contributes only the epoch's [K, B]
    index schedule and stacked edit specs.  Measured on the v5e at the
    paper-recipe batch 4: steady-state epoch time is a WASH vs the step
    loop (~4.1 s — the B=4 step is device-bound by the batch-independent
    gather/scatter row floor, not by dispatch), but first-epoch compile
    drops ~3× (one program replaces the per-variant step set) and the
    per-step host path vanishes entirely, which matters on hosts slower
    than the accelerator.

    batch_fn: (data, meas, gt, idx[B]) -> {"verts", "measure", gt keys} —
    the pure DeviceDataSource materializer; `data`/`meas`/`gt` are passed
    as arguments (closing over multi-GB staged arrays would ship them as
    compile-time constants).  `gt` is the staged dict of precomputed
    per-sample GT loss inputs (None when not staged).  exc_variant may be
    'dynamic': the 'ori_or_m' coin flips ride in specs["exc_is_ori"] [K].

    Returns jitted: (params, opt_state, data, meas, gt, idx_tr [K,Bt],
    idx_in [K,Bi], idx_ex [K,Bi], specs {.: [K,...]})
    -> (params, opt_state, metrics {.: [K]}).
    """
    loss_fn = make_loss_fn(model, tables, flags, exc_variant)

    def step(params, opt_state, data, meas, gt, idx_tr, idx_in, idx_ex,
             specs):
        def one(carry, xs):
            p, o = carry
            it, ii, ie, spec = xs
            batch = batch_fn(data, meas, gt, it)
            interp = batch_fn(data, meas, gt, ii)
            exc = batch_fn(data, meas, gt, ie)
            (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, batch, interp, exc, spec)
            m["gnorm"] = optax.global_norm(grads)
            updates, o = optimizer.update(grads, o, p)
            p = jax.tree.map(lambda a, u: a + u, p, updates)
            return (p, o), m

        (params, opt_state), metrics = jax.lax.scan(
            one, (params, opt_state), (idx_tr, idx_in, idx_ex, specs))
        return params, opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)

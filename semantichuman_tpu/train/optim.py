"""Optimizer + LR schedule matching the reference recipe:
torch Adam(lr, weight_decay) — COUPLED L2 (decay added to the gradient
before the moment updates, not AdamW) — with StepLR gamma-per-epoch
(reference: main.py:262-266, configure/cfgs.py:89-91)."""

from __future__ import annotations

import optax


def make_optimizer(lr: float, weight_decay: float, lr_decay: float,
                   steps_per_epoch: int, warmup_epochs: int = 0,
                   schedule_kind: str = "exp", n_epochs: int = 0,
                   grad_clip: float = 0.0, adam_b2: float = 0.999,
                   skip_nonfinite: int = 0):
    """optax chain replicating torch.optim.Adam(weight_decay=λ) + StepLR.

    warmup_epochs > 0 adds a linear lr ramp over the first N epochs — a
    large-batch stabilizer the reference (batch 4) never needs; 0 (the
    default) reproduces the reference schedule exactly.

    schedule_kind: 'exp' (the reference's per-epoch StepLR gamma) or
    'cosine' (cosine anneal from lr to 0 over n_epochs — a fixed-budget
    schedule that typically beats exponential when the total step count
    is known, as in the fast large-batch recipe; requires n_epochs).

    grad_clip > 0 prepends global-norm gradient clipping (the
    torch.nn.utils.clip_grad_norm_ convention: raw grads are clipped
    BEFORE the coupled-L2 decay term is added) — a stabilizer for the
    near-the-edge large-batch recipes (the fast recipe's lr can NaN
    mid-cosine on unlucky seeds without it); 0 (the default) reproduces
    the reference exactly.  The torch-checkpoint optimizer-state importer
    (utils.import_torch._build_optax_state) walks the chain state by
    TYPE, so the clip's EmptyState passes through untouched.

    adam_b2 < 0.999 shortens the second-moment memory — the standard
    large-batch stabilizer for Adam's stale-v failure (after a sudden
    loss-landscape shift, long-memory v underestimates the new gradient
    scale and the per-element effective steps blow up even with the raw
    grads clipped; measured on the fast recipe: seed 3 spikes gnorm
    2.7 -> 48.8 in one chunk and NaNs with clip=5 alone).  0.999 (the
    default) is torch.optim.Adam's default, i.e. reference parity.

    skip_nonfinite > 0 wraps the whole chain in optax.apply_if_finite:
    a step whose gradients contain NaN/Inf is SKIPPED (zero update, Adam
    moments untouched) instead of poisoning the parameters — after N
    consecutive bad steps it gives up and lets the update through so the
    failure stays visible.  Matters most under multi-epoch scan chunks
    (train.scan_epochs), where a single bad step would otherwise destroy
    the whole fused dispatch with no host-side chance to intervene."""
    schedule = make_schedule(lr, lr_decay, steps_per_epoch, warmup_epochs,
                             schedule_kind, n_epochs)
    steps = []
    if grad_clip > 0:
        steps.append(optax.clip_by_global_norm(grad_clip))
    steps += [
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=adam_b2, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    ]
    opt = optax.chain(*steps)
    if skip_nonfinite > 0:
        opt = optax.apply_if_finite(opt, max_consecutive_errors=skip_nonfinite)
    return opt


def make_schedule(lr: float, lr_decay: float, steps_per_epoch: int,
                  warmup_epochs: int = 0, schedule_kind: str = "exp",
                  n_epochs: int = 0):
    """The lr schedule alone (step -> lr); see make_optimizer."""
    spe = max(steps_per_epoch, 1)
    if schedule_kind not in ("exp", "cosine"):
        raise ValueError(f"unknown schedule_kind {schedule_kind!r}")
    if schedule_kind == "cosine" and n_epochs <= 0:
        raise ValueError("schedule_kind='cosine' needs n_epochs")

    def schedule(step):
        import jax.numpy as jnp
        epoch = step // spe
        if schedule_kind == "cosine":
            frac = jnp.clip(epoch / max(n_epochs, 1), 0.0, 1.0)
            out = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        else:
            out = lr * (lr_decay ** epoch)
        if warmup_epochs:
            out = out * jnp.minimum((step + 1.0) / (warmup_epochs * spe),
                                    1.0)
        return out

    return schedule

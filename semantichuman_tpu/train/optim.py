"""Optimizer + LR schedule matching the reference recipe:
torch Adam(lr, weight_decay) — COUPLED L2 (decay added to the gradient
before the moment updates, not AdamW) — with StepLR gamma-per-epoch
(reference: main.py:262-266, configure/cfgs.py:89-91)."""

from __future__ import annotations

import optax


def make_optimizer(lr: float, weight_decay: float, lr_decay: float,
                   steps_per_epoch: int, warmup_epochs: int = 0):
    """optax chain replicating torch.optim.Adam(weight_decay=λ) + StepLR.

    warmup_epochs > 0 adds a linear lr ramp over the first N epochs — a
    large-batch stabilizer the reference (batch 4) never needs; 0 (the
    default) reproduces the reference schedule exactly."""
    spe = max(steps_per_epoch, 1)

    def schedule(step):
        epoch = step // spe
        out = lr * (lr_decay ** epoch)
        if warmup_epochs:
            import jax.numpy as jnp
            out = out * jnp.minimum((step + 1.0) / (warmup_epochs * spe),
                                    1.0)
        return out

    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    )

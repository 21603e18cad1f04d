"""Test/dryrun helpers that force backend-gated fast paths on.

The banded/one-hot dispatchers key on `jax.default_backend() in
("tpu", "axon")` (ops/spiral_conv.py, ops/sampling.py), so a CPU-mesh
dryrun or CI run would silently skip the machinery the TPU trainer
actually executes.  This module is the single source of truth for the
gate-forcing patch set — `__graft_entry__.trainer_dryrun` and
tests/test_banding.py both use it, so a new gate added here is certified
by both consumers.
"""

from __future__ import annotations


_SMALL_PRESETS = ((8, 32), (16, 64))


def band_gate_patches():
    """The patch set as (module, attr, forced value) triples — the single
    list both `force_band_gates` and pytest `monkeypatch.setattr` consumers
    apply."""
    import importlib

    from ..models import tables as tables_mod
    from ..ops import banding as banding_mod
    from ..ops import sampling as sampling_mod
    # the ops package re-exports the spiral_conv FUNCTION under the same
    # name, so the module must be imported by path
    sconv_mod = importlib.import_module(
        "semantichuman_tpu.ops.spiral_conv")

    return [
        (tables_mod, "BAND_MIN_V1", 1),
        (tables_mod, "BAND_MIN_ROWS", 1),
        (banding_mod, "BAND_PRESETS", _SMALL_PRESETS),
        (banding_mod, "UNPOOL_BAND_PRESETS", _SMALL_PRESETS),
        (banding_mod, "POOL_BAND_PRESETS", _SMALL_PRESETS),
        (banding_mod, "MAX_OOB_FRAC", 1.0),
        (sconv_mod, "_banded_ok", lambda *a: True),
        (sampling_mod, "_pool_band_ok", lambda *a: True),
        (sampling_mod, "_unpool_band_ok", lambda *a: True),
    ]


def force_band_gates():
    """Force the banded backend gates ON and scale the band presets down
    to tiny test topologies.  Returns a restore callable."""
    patches = band_gate_patches()
    saved = [(mod, name, getattr(mod, name)) for mod, name, _ in patches]
    for mod, name, val in patches:
        setattr(mod, name, val)

    def restore():
        for mod, name, val in saved:
            setattr(mod, name, val)

    return restore

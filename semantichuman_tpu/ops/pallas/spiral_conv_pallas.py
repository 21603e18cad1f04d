"""Pallas spiral-conv kernel: fused gather + matmul, probe-gated.

Status on the current toolchain (v5e, Mosaic as of 2026-08): the spiral
gather cannot be expressed inside a TPU kernel — Mosaic's dynamic gather
(`take_along_axis`) requires the source to live in a single vreg along the
gathered dimension and fails with "Multiple source vregs along gather
dimension" for any real vertex count.  Measured alternatives:

  * XLA's native gather+matmul (ops/spiral_conv.py): ~10 ms for the
    B=128 level-0 gather — the production path.
  * inverse-table backward (scatter->gather conversion): 51 ms vs XLA's
    scatter at 38 ms — the inverse table's K_max (~2x mean spiral length)
    doubles read volume; rejected.
  * scalar-prefetch + per-row async-DMA gather (the embedding-lookup
    idiom; benchmarks/pallas_dma_gather_probe.py, r2): indices in SMEM,
    one windowed make_async_copy per gathered row, x packed [V1, B*C] so
    each row is one contiguous 8 KB copy (rows reshaped [V1, SUB, 128] —
    HBM slices must be whole (8,128) tiles).  Correct, but ISSUE-RATE
    bound: 103k rows in 9.94 ms ≈ 96 ns/descriptor ≈ 108 GB/s, vs XLA's
    take at 7.12 ms (160 GB/s) on the same packed layout → 0.72x fwd.
    The matching scatter-free CSR backward: 10.61 ms vs XLA's scatter-add
    VJP 11.27 ms → 1.06x, below the 1.2x accept bar.  Per-row DMA cannot
    beat XLA's gather at spiral-conv row sizes (it would need ≥32 KB rows
    to amortize descriptor issue); question closed.

So `spiral_conv_auto` PROBES this kernel once per process on tiny shapes
and transparently falls back to the XLA path when Mosaic rejects it; if a
future toolchain lifts the gather restriction the fused kernel switches on
by itself.  The kernel's math is validated in interpret mode on CPU
(tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spiral_conv import ACTIVATIONS, spiral_conv


def _act(name: str, v: jnp.ndarray) -> jnp.ndarray:
    # expm1/erf-free forms: Mosaic lacks several transcendental primitives
    if name == "elu":
        return jnp.where(v > 0, v, jnp.exp(jnp.minimum(v, 0.0)) - 1.0)
    if name == "relu":
        return jnp.maximum(v, 0.0)
    if name == "identity":
        return v
    return ACTIVATIONS[name](v)


def _kernel(x_ref, idx_ref, w_ref, b_ref, o_ref, *, n_steps: int,
            activation: str):
    """x [V1, C] VMEM, idx [S, V1] (transposed: the spiral step indexes the
    leading dim — lane slices must be 128-aligned), w [S, C, C_out], b
    [1, C_out] -> o [V1, C_out]."""
    x = x_ref[:]
    v1, c = x.shape

    def body(s, acc):
        ids = jax.lax.broadcast_in_dim(idx_ref[s], (v1, c), (0,))
        rows = jnp.take_along_axis(x, ids, axis=0)
        return acc + jnp.dot(rows, w_ref[s],
                             preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, n_steps, body,
                            jnp.zeros((v1, o_ref.shape[-1]), jnp.float32))
    y = _act(activation, acc + b_ref[:])
    # zero the dummy (last) row — reference models.py:49-51 mask semantics
    keep = jax.lax.broadcasted_iota(jnp.int32, (v1, 1), 0) < (v1 - 1)
    o_ref[:] = jnp.where(keep, y, 0.0)


def spiral_conv_fused(x: jnp.ndarray, spiral_idx: jnp.ndarray,
                      w: jnp.ndarray, bias: jnp.ndarray,
                      activation: str = "elu", compute_dtype=None,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused spiral conv. x [B, V1, C], spiral_idx [V1, S],
    w [S*C, C_out], bias [C_out] -> [B, V1, C_out]."""
    del compute_dtype  # fp32 accumulate; inputs stay as given
    b, v1, c = x.shape
    s = spiral_idx.shape[1]
    c_out = w.shape[1]
    idx_t = jnp.swapaxes(spiral_idx, 0, 1)           # [S, V1]
    w3 = w.reshape(s, c, c_out)
    bias2 = bias.reshape(1, c_out)

    call = pl.pallas_call(
        functools.partial(_kernel, n_steps=s, activation=activation),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v1, c_out), jnp.float32),
        interpret=interpret,
    )
    return jax.vmap(lambda xb: call(xb, idx_t, w3, bias2))(x)


_PROBE_RESULT: bool | None = None


def _probe() -> bool:
    """One-time check: does Mosaic compile AND differentiate the fused
    kernel at realistic shapes on this chip?  Tiny shapes can slip through
    Mosaic's single-vreg gather restriction that real vertex counts hit, and
    pallas_call has no automatic VJP — so the probe must exercise both."""
    global _PROBE_RESULT
    if _PROBE_RESULT is not None:
        return _PROBE_RESULT
    try:
        x = jnp.zeros((1, 1024, 128), jnp.float32)
        idx = jnp.zeros((1024, 8), jnp.int32)
        w = jnp.zeros((8 * 128, 128), jnp.float32)
        bias = jnp.zeros((128,), jnp.float32)

        def f(x):
            return jnp.sum(spiral_conv_fused(x, idx, w, bias))

        jax.block_until_ready(jax.grad(f)(x))
        _PROBE_RESULT = True
    except Exception:
        _PROBE_RESULT = False
    return _PROBE_RESULT


def spiral_conv_auto(x, spiral_idx, w, bias, activation: str = "elu",
                     compute_dtype=None, band=None):
    """XLA gather+matmul by default; the fused Pallas kernel only when
    explicitly requested (SH_TPU_FORCE_PALLAS=1) AND the probe passes.

    The opt-in default is deliberate: the current Mosaic toolchain rejects
    multi-vreg gathers at real vertex counts, pallas_call lacks an automatic
    VJP for the training path, and measured XLA gather+matmul already runs
    near HBM bandwidth.  `band` (carried by fine levels when
    cfg.model.banded_conv is on) passes through to the XLA dispatcher; the
    forced-Pallas measurement path ignores it (the kernel predates banding
    and is kept only as a measurement record).
    """
    import os
    if os.environ.get("SH_TPU_FORCE_PALLAS") and _probe():
        return spiral_conv_fused(x, spiral_idx, w, bias, activation,
                                 compute_dtype)
    return spiral_conv(x, spiral_idx, w, bias, activation, compute_dtype,
                       band=band)

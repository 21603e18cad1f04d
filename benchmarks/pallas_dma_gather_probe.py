"""Pallas probe: scalar-prefetch + per-row async-DMA spiral gather.

VERDICT r1 item 5 — the one TPU mechanism not yet tried for the spiral
gather/scatter (the measured bottleneck): treat the spiral table like an
embedding lookup.  Indices ride in SMEM (scalar prefetch); the kernel
issues one async DMA per gathered row (x packed as [V1, B*C] so each row
is a multi-KB contiguous copy), windowed W-deep so many copies are in
flight while the scalar core races ahead building descriptors.

Three measurements at the production level-0 decoder shape
(V=6893, S=15, B=128, C=16 → the 847 MB gathered buffer):

  1. XLA jnp.take on the same packed layout  (the current production path)
  2. DMA gather kernel (forward)
  3. DMA inverse-CSR gather+reduce (the scatter-free BACKWARD: for each
     source row u, sum the cotangent rows of every spiral slot that read
     u) vs XLA's scatter-add VJP.

Run: python benchmarks/pallas_dma_gather_probe.py [--iters N]
Prints one JSON line.  Accept bar (VERDICT): >=1.2x XLA fwd+bwd, else the
numbers get recorded in ops/pallas/spiral_conv_pallas.py and the question
is closed.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

W = 16  # DMA in-flight window


def _gather_kernel(idx_ref, x_ref, o_ref, sem, *, rows_per_prog: int):
    """o[k] = x[idx[k]] for k in this program's row range; windowed DMAs.

    x/o are [N, SUB, 128] — each logical row reshaped to whole (8,128)
    tiles, since HBM memref slices must be tile-aligned (a [1, D] slice of
    a 2-D buffer is rejected: 'must be aligned to tiling (8)')."""
    base = pl.program_id(0) * rows_per_prog

    def dma(k, slot):
        return pltpu.make_async_copy(x_ref.at[idx_ref[k]], o_ref.at[k],
                                     sem.at[slot])

    def issue(i, carry):
        k = base + i

        @pl.when(i >= W)
        def _wait():
            dma(k - W, i % W).wait()

        dma(k, i % W).start()
        return carry

    jax.lax.fori_loop(0, rows_per_prog, issue, 0, unroll=False)

    def drain(i, carry):
        k = base + rows_per_prog - W + i

        @pl.when(k >= base)
        def _wait():
            dma(k, (rows_per_prog - W + i) % W).wait()

        return carry

    jax.lax.fori_loop(0, W, drain, 0, unroll=False)


def dma_gather(x: jnp.ndarray, idx: jnp.ndarray,
               rows_per_prog: int = 1024) -> jnp.ndarray:
    """x [N, D] (packed rows), idx [M] int32 -> out [M, D] via per-row DMA.
    D must be a multiple of 1024 (f32 (8,128) whole-tile rows)."""
    m = idx.shape[0]
    n, d = x.shape
    assert m % rows_per_prog == 0, (m, rows_per_prog)
    assert d % 1024 == 0, d
    sub = d // 128
    grid = (m // rows_per_prog,)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, rows_per_prog=rows_per_prog),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((W,))],
        ),
        out_shape=jax.ShapeDtypeStruct((m, sub, 128), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(idx, x.reshape(n, sub, 128))
    return out.reshape(m, d)


def _csr_reduce_kernel(offs_ref, cols_ref, g_ref, o_ref, acc, sem,
                       *, rows_per_prog: int, sub: int):
    """o[u] = sum_{j in [offs[u], offs[u+1])} g[cols[j]] — the scatter-free
    backward: windowed DMA the cotangent rows into VMEM slots, accumulate.
    g is [M, SUB, 128] (tile-aligned rows); acc [W, SUB, 128]."""
    base = pl.program_id(0) * rows_per_prog

    def dma(j, slot):
        return pltpu.make_async_copy(g_ref.at[cols_ref[j]], acc.at[slot],
                                     sem.at[slot])

    def row(u_local, carry0):
        u = base + u_local
        lo = offs_ref[u]
        hi = offs_ref[u + 1]

        # W-chunked: start up to W copies, then wait+accumulate each slot
        def chunk(carry):
            start, total = carry
            n = jnp.minimum(hi - start, W)

            def st(i, c):
                @pl.when(i < n)
                def _start():
                    dma(start + i, i).start()
                return c

            jax.lax.fori_loop(0, W, st, 0)

            def rd(i, tot):
                def take(tot):
                    dma(start + i, i).wait()
                    return tot + acc[i]

                return jax.lax.cond(i < n, take, lambda t: t, tot)

            total = jax.lax.fori_loop(0, W, rd, total)
            return (start + W, total)

        total = jax.lax.while_loop(
            lambda c: c[0] < hi, chunk,
            (lo, jnp.zeros((sub, 128), jnp.float32)))[1]
        o_ref[u_local] = total
        return carry0

    jax.lax.fori_loop(0, rows_per_prog, row, 0, unroll=False)


def dma_csr_reduce(g: jnp.ndarray, offs: jnp.ndarray, cols: jnp.ndarray,
                   n_out: int, rows_per_prog: int = 128) -> jnp.ndarray:
    m, d = g.shape
    assert n_out % rows_per_prog == 0, (n_out, rows_per_prog)
    assert d % 1024 == 0, d
    sub = d // 128
    out = pl.pallas_call(
        functools.partial(_csr_reduce_kernel, rows_per_prog=rows_per_prog,
                          sub=sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_out // rows_per_prog,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (rows_per_prog, sub, 128), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((W, sub, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((W,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n_out, sub, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(offs, cols, g.reshape(m, sub, 128))
    return out.reshape(n_out, d)


def bench_chained(fn, idx_like, iters=20):
    """Time `iters` executions of fn(idx_like) with a data dependency chained
    through the int index array (cheap: <1 MB copy/iter), so iterations
    cannot overlap regardless of the platform's dispatch behavior.  fn must
    return an array; out[0, 0] feeds the next iteration's indices."""

    @jax.jit
    def loop(idx0):
        def body(_, carry):
            idx_c, acc = carry
            out = fn(idx_c)
            bump = (out[0, 0] * 0).astype(idx_c.dtype)
            return (idx_c + bump, acc + out[0, 0].astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, (idx0, jnp.float32(0.0)))

    out = loop(idx_like)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(idx_like)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, fn(idx_like)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--c", type=int, default=16)
    args = ap.parse_args()

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    # production level-0 shape, rows packed as B*C lanes
    topo = np.load(os.path.join(REPO, "assets",
                                "topology_synth_full_2222.npz"))
    spir = topo["spirals_0"]                      # [V1, S]
    v1, s = spir.shape
    d = args.b * args.c
    v1_pad = ((v1 * s + 1023) // 1024 * 1024 + s - 1) // s  # make M%1024==0
    m = 0
    idx_flat = spir.reshape(-1).astype(np.int32)
    pad_to = (idx_flat.size + 1023) // 1024 * 1024
    idx_flat = np.concatenate(
        [idx_flat, np.full(pad_to - idx_flat.size, v1 - 1, np.int32)])
    m = idx_flat.size

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((v1, d), np.float32))
    idx = jnp.asarray(idx_flat)

    results = {"V1": v1, "S": s, "rows": m, "row_bytes": d * 4,
               "gathered_mb": round(m * d * 4 / 1e6, 1)}

    # --- forward: XLA take vs DMA gather -----------------------------------
    t_xla, ref = bench_chained(lambda i: jnp.take(x, i, axis=0), idx,
                               iters=args.iters)
    try:
        t_dma, got = bench_chained(lambda i: dma_gather(x, i), idx,
                                   iters=args.iters)
        ok = bool(jnp.allclose(got, ref))
        results.update(fwd_xla_ms=round(t_xla * 1e3, 2),
                       fwd_dma_ms=round(t_dma * 1e3, 2),
                       fwd_dma_correct=ok,
                       fwd_speedup=round(t_xla / t_dma, 2))
    except Exception as e:
        results.update(fwd_xla_ms=round(t_xla * 1e3, 2),
                       fwd_dma_error=repr(e)[:300])

    # --- backward: XLA scatter-add VJP vs DMA CSR reduce ---------------------
    def take_sum(x, i):
        return jnp.sum(jnp.take(x, i, axis=0) * 0.5)

    t_xlab, dref = bench_chained(
        lambda i: jax.grad(take_sum)(x, i), idx, iters=args.iters)

    # CSR inverse: for each source row u, the list of flat positions k
    order = np.argsort(idx_flat, kind="stable")
    counts = np.bincount(idx_flat, minlength=v1)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    cols = order.astype(np.int32)
    g = jnp.full((m, d), 0.5, jnp.float32)
    n_out = (v1 + 127) // 128 * 128
    offs_pad = np.concatenate(
        [offs, np.full(n_out + 1 - offs.size, offs[-1], np.int32)])
    try:
        offs_j = jnp.asarray(offs_pad)
        t_dmab, got = bench_chained(
            lambda c: dma_csr_reduce(g, offs_j, c, n_out),
            jnp.asarray(cols), iters=args.iters)
        ok = bool(jnp.allclose(got[:v1], dref, rtol=1e-5, atol=1e-5))
        results.update(bwd_xla_ms=round(t_xlab * 1e3, 2),
                       bwd_dma_ms=round(t_dmab * 1e3, 2),
                       bwd_dma_correct=ok,
                       bwd_speedup=round(t_xlab / t_dmab, 2))
    except Exception as e:
        results.update(bwd_xla_ms=round(t_xlab * 1e3, 2),
                       bwd_dma_error=repr(e)[:300])

    print(json.dumps(results))


if __name__ == "__main__":
    main()

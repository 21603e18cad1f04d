"""Layout probe: batch-major vs vertex-major spiral conv (fwd+bwd).

The production trunk keeps x as [B, V+1, C] and gathers along axis 1
(ops/spiral_conv.py).  The DMA probe showed XLA's take on a vertex-major
packed layout [V+1, B*C] runs ~1.4x faster for the same bytes.  This probe
times the COMPLETE conv (gather + matmul + act + dummy mask) fwd+bwd in
both layouts at the production level-0/1 shapes, including a per-call
boundary transpose for the vertex-major variant (what a drop-in swap would
pay), and a transpose-free variant (what a whole-trunk refactor would get).

Prints one JSON line per shape.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def batch_major(x, idx, w, b):
    """x [B, V1, C] -> y [B, V1, O] (production ops/spiral_conv.py)."""
    bsz, _, c = x.shape
    v1, s = idx.shape
    g = jnp.take(x, idx.reshape(-1), axis=1).reshape(bsz, v1, s * c)
    y = jax.nn.elu(jnp.dot(g, w, preferred_element_type=jnp.float32)
                   + b)
    return y.at[:, -1, :].set(0.0)


def vertex_major(xt, idx, w, b):
    """xt [V1, B, C] -> y [V1, B, O]; gather along axis 0."""
    v1, bsz, c = xt.shape
    _, s = idx.shape
    g = jnp.take(xt, idx.reshape(-1), axis=0)          # [V1*S, B, C]
    g = g.reshape(v1, s, bsz, c).transpose(0, 2, 1, 3)  # [V1, B, S, C]
    g = g.reshape(v1, bsz, s * c)
    y = jax.nn.elu(jnp.dot(g, w, preferred_element_type=jnp.float32) + b)
    return y.at[-1, :, :].set(0.0)


def vertex_major_boundary(x, idx, w, b):
    """[B, V1, C] in/out, vertex-major inside (pays two transposes)."""
    y = vertex_major(x.transpose(1, 0, 2), idx, w, b)
    return y.transpose(1, 0, 2)


def bench_fwd_bwd(fn, x, idx, w, b, iters):
    """Chained fwd+bwd timing: grads wrt x and w, chained through idx."""

    def loss(x, w, i):
        return jnp.sum(fn(x, i, w, b) ** 2)

    grad = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def loop(idx0):
        def body(_, carry):
            i, acc = carry
            dx, dw = grad(x, w, i)
            bump = (dx.ravel()[0] * 0).astype(i.dtype)
            return (i + bump, acc + dw[0, 0])

        return jax.lax.fori_loop(0, iters, body, (idx0, jnp.float32(0.0)))

    out = loop(idx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(idx)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    topo = np.load(os.path.join(REPO, "assets",
                                "topology_synth_full_2222.npz"))
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    # production decoder hot shapes: (level, C_in, C_out)
    for lv, cin, cout in [(0, 16, 3), (0, 3, 16), (1, 32, 16), (1, 16, 32)]:
        idx = jnp.asarray(topo[f"spirals_{lv}"].astype(np.int32))
        v1, s = idx.shape
        x = jnp.asarray(
            rng.standard_normal((args.b, v1, cin)), dt)
        w = jnp.asarray(rng.standard_normal((s * cin, cout)) * 0.05, dt)
        bias = jnp.asarray(np.zeros(cout), jnp.float32)

        t_bm = bench_fwd_bwd(batch_major, x, idx, w, bias, args.iters)
        t_vb = bench_fwd_bwd(vertex_major_boundary, x, idx, w, bias,
                             args.iters)
        xt = jnp.asarray(np.ascontiguousarray(
            np.asarray(x).transpose(1, 0, 2)))
        t_vm = bench_fwd_bwd(vertex_major, xt, idx, w, bias, args.iters)

        # correctness: same outputs
        yb = np.asarray(batch_major(x, idx, w, bias), np.float32)
        yv = np.asarray(vertex_major(xt, idx, w, bias), np.float32)
        ok = bool(np.allclose(yb, yv.transpose(1, 0, 2), atol=1e-2))

        print(json.dumps({
            "level": lv, "V1": v1, "S": s, "Cin": cin, "Cout": cout,
            "B": args.b, "dtype": args.dtype,
            "batch_major_ms": round(t_bm * 1e3, 2),
            "vertex_major_ms": round(t_vm * 1e3, 2),
            "vertex_major_boundary_ms": round(t_vb * 1e3, 2),
            "speedup_pure": round(t_bm / t_vm, 2),
            "speedup_boundary": round(t_bm / t_vb, 2),
            "correct": ok,
        }), flush=True)


if __name__ == "__main__":
    main()

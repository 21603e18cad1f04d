"""Shared axon-safe fwd+bwd timing harness for the probe scripts.

Axon-platform timing rules (measured, docs/BENCHMARKS.md):
  * naive re-run loops OVERLAP on the remote platform — chain iterations
    through a data dependency inside one jitted lax.scan;
  * a byte-identical repeated dispatch can be served from a result cache
    (~0 ms readings) — perturb the timed call's first operand per repeat;
  * block_until_ready can return before remote execution completes —
    force completion by FETCHING a scalar of the result;
  * closures over large device arrays ship as compile-request constants
    (HTTP 413) — every operand rides as an ARGUMENT;
  * use >= 100 chained iterations so per-dispatch overhead (~0.3 s on the
    tunnel) amortizes.
"""

from __future__ import annotations

import time


def timed_grad(fn, args, iters, reduction: str = "sum"):
    """sec/iter of grad(loss(fn))(args), loss = sum (default) or sum-abs
    (kept selectable so each probe's historical numbers stay comparable)."""
    import jax
    import jax.numpy as jnp

    if reduction == "sum":
        def loss(x, *rest):
            return jnp.sum(fn(x, *rest).astype(jnp.float32))
    elif reduction == "abs":
        def loss(x, *rest):
            return jnp.sum(jnp.abs(fn(x, *rest)))
    else:
        raise ValueError(f"unknown reduction {reduction!r}")

    g = jax.grad(loss)

    @jax.jit
    def chain(x, *rest):
        def body(carry, _):
            y = g(carry, *rest)
            return carry + 1e-12 * y, ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    r = chain(*args)
    float(jnp.sum(r))
    best = float("inf")
    for rep in range(2):
        args2 = (args[0] * (1.0 + 1e-6 * (rep + 1)),) + tuple(args[1:])
        t0 = time.perf_counter()
        r = chain(*args2)
        float(jnp.sum(r))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

"""On-chip dispatch exactness check (VERDICT r3 weak #6).

The one-hot and banded fast paths gate on `jax.default_backend() in
("tpu", "axon")` (ops/spiral_conv.py, ops/sampling.py), so CPU CI only
ever exercises them with the gate monkeypatched.  This script runs ON THE
CHIP, at production shapes, and asserts the DISPATCHER-SELECTED outputs
equal the take/dense baselines to the documented tolerances:

  * conv one-hot (B=4, coarse levels) and conv banded (B=128, fine
    levels): forward BITWISE equal under the bf16 trunk (the selection
    sums one product of a 1.0 and MXU operand truncation is idempotent
    through the following conv matmul — spiral_conv_onehot docstring);
    backward dx within one bf16 rounding.
  * pool/unpool one-hot (B=4) and banded (B=128): forward/backward within
    the same band (the 3-tap unpool weights pass through MXU operand
    truncation, so bitwise is not claimed there).

Exit 0 = all checks passed (record the printed table in
docs/BENCHMARKS.md); exit 2 = not on a TPU backend; exit 1 = a check
failed.  Usage: python benchmarks/onchip_dispatch_check.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# forward bitwise for the conv forms; bf16-rounding band for backward and
# for the weighted sampling forms.  The non-bitwise criterion is
# ELEMENTWISE: |got - ref| <= RTOL*|ref| + K_EPS*eps_bf16*max|ref| — a few
# roundings on the element's own magnitude, plus an absolute term tied to
# the ACCUMULATION scale (a sum-of-products element whose exact value is
# tiny relative to the sum's operands legitimately carries absolute error
# ~eps*scale under cancellation).  No flat scale-free atol and no
# global-max-normalized rel: small-magnitude entries must be right too.
BWD_RTOL = 2e-2
EPS_BF16 = 2.0 ** -8
K_EPS = 2.0


def _maxdiff(a, b):
    """-> (max |a-b|, max |a-b| / global scale, worst tolerance ratio)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.abs(a - b)
    ad = float(np.max(d))
    scale = max(float(np.max(np.abs(b))), 1e-30)
    tol = BWD_RTOL * np.abs(b) + K_EPS * EPS_BF16 * scale
    return ad, ad / scale, float(np.max(d / tol))


def main():
    # SH_TPU_DISPATCH_SMOKE=1: CPU logic smoke — small topology, gates
    # forced (the on-chip run is the evidence; this validates the harness)
    smoke = os.environ.get("SH_TPU_DISPATCH_SMOKE") == "1"

    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    if not smoke and jax.default_backend() not in ("tpu", "axon"):
        print(json.dumps({"dispatch_check": "skipped",
                          "reason": f"backend {jax.default_backend()!r} "
                                    "is not a TPU"}))
        return 2

    from semantichuman_tpu.utils.compilation_cache import enable_cache
    enable_cache()

    import importlib

    import jax.numpy as jnp

    sconv = importlib.import_module("semantichuman_tpu.ops.spiral_conv")
    sampling = importlib.import_module("semantichuman_tpu.ops.sampling")
    from semantichuman_tpu.models.tables import device_tables
    from semantichuman_tpu.topology.compiler import MeshHierarchy

    if smoke:
        from __graft_entry__ import _force_band_gates
        _force_band_gates()
        # the band gates are forced by the helper; the one-hot gates keep
        # their shape logic but drop the backend test (and the sampling
        # row floor, which the small smoke topology is below)
        sconv._onehot_ok = lambda b, v1: isinstance(b, int) and b <= 16 \
            and v1 <= 2048
        sampling._onehot_ok = lambda b, vf1: isinstance(b, int) and b <= 16
        import tempfile

        from semantichuman_tpu.data.synthetic import SyntheticHuman
        from semantichuman_tpu.topology import compile_topology
        sh = SyntheticHuman(n_theta=16, n_phi=36)
        hier = compile_topology(
            sh.template_verts, sh.template_faces, ds_factors=(2, 2, 2, 2),
            step_sizes=(2, 2, 1, 1, 1), dilation=(2, 2, 1, 1, 1),
            reference_vertex=0,
            cache_path=os.path.join(tempfile.mkdtemp(), "t.npz"))
        # smoke batch sizes: the one-hot conv gate needs V1<=2048 (all
        # small levels qualify) and the CPU gates are forced above
    else:
        topo = os.path.join(REPO, "assets", "topology_synth_full_2222.npz")
        hier = MeshHierarchy.load(topo)
    tables = device_tables(hier, banded=True)

    rng = np.random.default_rng(20260818)
    failures, rows = [], []

    def check(name, got, ref, bitwise, what):
        ad, rd, tr = _maxdiff(got, ref)
        ok = (ad == 0.0) if bitwise else (tr <= 1.0)
        rows.append(dict(check=name, what=what, max_abs=ad, max_rel=rd,
                         tol_ratio=tr, bitwise_required=bitwise, ok=ok))
        print(f"{'OK ' if ok else 'FAIL'} {name:42} {what:3} "
              f"max_abs={ad:.3e} max_rel={rd:.3e} tol_ratio={tr:.3f}"
              f"{' (bitwise)' if bitwise else ''}", flush=True)
        if not ok:
            failures.append(name)

    # --- conv: dispatcher vs take -----------------------------------------
    # (level, batch, c_in) regimes: one-hot fires at B=4 on levels with
    # V1 <= 2048; banded fires at any batch on levels carrying a band
    conv_cases = []
    for lvl, sp in enumerate(tables.spirals):
        v1 = int(sp.shape[0])
        band = tables.band_for(lvl)
        if v1 <= 2048:
            conv_cases.append((lvl, 4, 32, None, "onehot"))
        if band is not None:
            conv_cases.append((lvl, 128, 16, band, "banded"))
    for lvl, b, c, band, kind in conv_cases:
        sp = tables.spirals[lvl]
        v1, s = int(sp.shape[0]), int(sp.shape[1])
        co = 32
        x = rng.standard_normal((b, v1, c)).astype(np.float32)
        x[:, -1] = 0.0
        w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
        bias = rng.standard_normal(co).astype(np.float32)
        args = (jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias))

        def disp(xx, ww, bb):
            return sconv.spiral_conv(xx, sp, ww, bb, "elu",
                                     compute_dtype=jnp.bfloat16, band=band)

        def take(xx, ww, bb):
            return sconv.spiral_conv_take(xx, sp, ww, bb, "elu",
                                          compute_dtype=jnp.bfloat16)

        got = jax.jit(disp)(*args)
        ref = jax.jit(take)(*args)
        jax.block_until_ready((got, ref))
        name = f"conv L{lvl} B={b} {kind}"
        check(name, got, ref, bitwise=True, what="fwd")

        g_d = jax.jit(jax.grad(lambda *a: jnp.sum(disp(*a) ** 2),
                               argnums=(0, 1)))(*args)
        g_t = jax.jit(jax.grad(lambda *a: jnp.sum(take(*a) ** 2),
                               argnums=(0, 1)))(*args)
        jax.block_until_ready((g_d, g_t))
        check(name, np.asarray(g_d[0])[:, :-1], np.asarray(g_t[0])[:, :-1],
              bitwise=False, what="dx")
        check(name, g_d[1], g_t[1], bitwise=False, what="dw")

    # --- pool / unpool: dispatcher vs take --------------------------------
    for lvl in range(len(tables.pool_idx)):
        vf1 = int(tables.sizes[lvl]) + 1
        c = 32
        for b, label in ((4, "onehot"), (128, "banded")):
            band = (tables.pool_band_for(lvl) if label == "banded" else None)
            if label == "banded" and band is None:
                continue
            x = rng.standard_normal((b, vf1, c)).astype(np.float32)
            x[:, -1] = 0.0
            xj = jnp.asarray(x)

            def pdisp(xx):
                return sampling.pool(xx, tables.pool_idx[lvl], band=band)

            def ptake(xx):
                return sampling.pool_take(xx, tables.pool_idx[lvl])

            got, ref = jax.jit(pdisp)(xj), jax.jit(ptake)(xj)
            jax.block_until_ready((got, ref))
            name = f"pool L{lvl} B={b} {label}"
            check(name, got, ref, bitwise=False, what="fwd")
            g_d = jax.jit(jax.grad(lambda a: jnp.sum(pdisp(a) ** 2)))(xj)
            g_t = jax.jit(jax.grad(lambda a: jnp.sum(ptake(a) ** 2)))(xj)
            jax.block_until_ready((g_d, g_t))
            check(name, np.asarray(g_d)[:, :-1], np.asarray(g_t)[:, :-1],
                  bitwise=False, what="dx")

    for lvl in range(len(tables.unpool_idx)):
        vc1 = int(tables.sizes[lvl + 1]) + 1
        c = 32
        for b, label in ((4, "onehot"), (128, "banded")):
            band = (tables.unpool_band_for(lvl)
                    if label == "banded" else None)
            if label == "banded" and band is None:
                continue
            x = rng.standard_normal((b, vc1, c)).astype(np.float32)
            x[:, -1] = 0.0
            xj = jnp.asarray(x)

            def udisp(xx):
                return sampling.unpool(xx, tables.unpool_idx[lvl],
                                       tables.unpool_w[lvl], band=band)

            def utake(xx):
                return sampling.unpool_take(xx, tables.unpool_idx[lvl],
                                            tables.unpool_w[lvl])

            got, ref = jax.jit(udisp)(xj), jax.jit(utake)(xj)
            jax.block_until_ready((got, ref))
            name = f"unpool L{lvl} B={b} {label}"
            check(name, got, ref, bitwise=False, what="fwd")
            g_d = jax.jit(jax.grad(lambda a: jnp.sum(udisp(a) ** 2)))(xj)
            g_t = jax.jit(jax.grad(lambda a: jnp.sum(utake(a) ** 2)))(xj)
            jax.block_until_ready((g_d, g_t))
            check(name, np.asarray(g_d)[:, :-1], np.asarray(g_t)[:, :-1],
                  bitwise=False, what="dx")

    print(json.dumps({"dispatch_check": "ok" if not failures else "failed",
                      "n_checks": len(rows), "failures": failures}))
    return 0 if not failures else 1


if __name__ == "__main__":
    raise SystemExit(main())

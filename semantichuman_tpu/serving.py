"""Serving: ahead-of-time exported inference artifacts.

The reference has no serving story (its demo re-runs the whole training
precompute just to decode, utils_SH.py:225-410).  Here a trained model's
inference functions are exported as self-contained StableHLO artifacts
(jax.export): params baked in, topology tables baked in, loadable and
callable without the framework, the topology compiler, or the checkpoint —
the deployment unit for a TPU serving fleet.

Artifacts (one file each, `.shlo`):
  forward  (verts [B, V+1, 3])          -> (rec, z, z_kps)
  encode   (verts [B, V+1, 3])          -> (z, z_kps, dummy)
  decode   (z, z_kps [B, P, nz|nk])     -> verts [B, V, 3]
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jexport

from .constants import KPS_KEEP


def _spec(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def export_inference(model, params, j_regressor, out_dir: str,
                     batch_size: int = 1,
                     platforms: tuple | None = None,
                     symbolic_batch: bool = True) -> dict:
    """Export forward/encode/decode artifacts.  Returns the manifest (also
    written to out_dir/manifest.json).

    By default the batch dimension is exported SYMBOLIC (jax.export shape
    polymorphism): one `.shlo` artifact serves every batch size — the
    loader specializes (compiles) per concrete batch on first use, so a
    serving fleet ships one artifact instead of one per bucket.  When the
    model fails to lower polymorphically, exporting falls back to the
    fixed `batch_size` (recorded in the manifest as symbolic_batch:
    false).

    The model's compute (trunk) dtype is baked into the artifact and
    recorded in the manifest: checkpoints are dtype-independent (params
    stay float32; the bf16 trunk is a runtime cast inside the traced
    module), so exporting a bfloat16 serving bundle from an f32-trained
    checkpoint needs no conversion — build the model with
    trunk_dtype='bfloat16' (cli/export.py --trunk_dtype) and export.

    Tradeoff (measured, benchmarks/serving_bench.py): the symbolic trace
    cannot take the vertex-major layout of the narrow-channel input conv
    (ops.spiral_conv keys it on a concrete batch >= 32) — in practice
    ~1 % at B=64 and a wash at B<=16, so the polymorphic artifact is the
    right default everywhere; symbolic_batch=False remains for squeezing
    the last percent at a known large batch."""
    os.makedirs(out_dir, exist_ok=True)
    jreg = jnp.asarray(np.asarray(j_regressor, np.float32))
    keep = jnp.asarray(np.asarray(KPS_KEEP, np.int32))
    v1 = int(jreg.shape[1]) + 1                     # vertices + dummy row
    p = model.n_parts
    nz, nk = model.latent_size, model.kps_latent_size
    c = model.enc_out_c
    kw = dict(platforms=platforms) if platforms else {}

    def regress(verts):
        kps_full = jnp.einsum("jv,bvc->bjc", jreg, verts[:, :-1])
        return jnp.take(kps_full, keep, axis=1)

    def forward(verts):
        return model(params, verts, regress(verts))

    def encode(verts):
        return model.encode(params, verts, regress(verts))

    def decode(z, z_kps):
        dummy = jnp.zeros((z.shape[0], 1, c), jnp.float32)
        return model.decode(params, z, z_kps, dummy)[:, :-1]

    def run_exports(b):
        exports = {
            "forward": (forward, (_spec((b, v1, 3)),)),
            "encode": (encode, (_spec((b, v1, 3)),)),
            "decode": (decode, (_spec((b, p, nz)), _spec((b, p, nk)))),
        }
        out = {}
        for name, (fn, specs) in exports.items():
            out[name] = (jexport.export(jax.jit(fn), **kw)(*specs), specs)
        return out

    arts, sym = None, False
    if symbolic_batch:
        try:
            (bdim,) = jexport.symbolic_shape("b")
            arts = run_exports(bdim)
            sym = True
        except Exception as e:
            import warnings
            warnings.warn(f"symbolic-batch export failed ({e!r}); "
                          f"falling back to fixed batch {batch_size}",
                          stacklevel=2)
    if arts is None:
        arts = run_exports(batch_size)

    trunk_dtype = ("bfloat16" if model.compute_dtype == jnp.bfloat16
                   else "float32")
    manifest = {"batch_size": None if sym else batch_size,
                "symbolic_batch": sym, "n_vertices": v1 - 1,
                "n_parts": p, "nz": nz, "nk": nk,
                "trunk_dtype": trunk_dtype, "artifacts": {}}
    for name, (exp, specs) in arts.items():
        path = os.path.join(out_dir, f"{name}.shlo")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        manifest["artifacts"][name] = {
            "file": f"{name}.shlo",
            "platforms": list(exp.platforms),
            "in_shapes": [[d if isinstance(d, int) else str(d)
                           for d in s.shape] for s in specs],
        }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingBundle:
    """Load an exported inference bundle; callables take/return jnp arrays."""

    def __init__(self, bundle_dir: str):
        with open(os.path.join(bundle_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self._fns = {}
        self._jitted = {}
        for name, meta in self.manifest["artifacts"].items():
            with open(os.path.join(bundle_dir, meta["file"]), "rb") as f:
                self._fns[name] = jexport.deserialize(f.read())

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            exp = self._fns[name]
        except KeyError:
            raise AttributeError(
                f"no artifact {name!r}; have {sorted(self._fns)}") from None
        # jit the call wrapper once per artifact: a bare exp.call re-lowers
        # the exported module on EVERY invocation (measured 75 ms/call vs
        # 9 ms jitted at B=64 on the v5e)
        fn = self._jitted.get(name)
        if fn is None:
            fn = self._jitted[name] = jax.jit(exp.call)
        return fn

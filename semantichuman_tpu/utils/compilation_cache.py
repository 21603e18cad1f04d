"""Persistent XLA compilation cache.

Full-scale train-step compiles take minutes over remote-compile tunnels;
the persistent cache makes every process after the first start in seconds.
Opt out with SH_TPU_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache", "jax")


def enable_cache(cache_dir: str | None = None) -> str | None:
    if os.environ.get("SH_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        return None
    if backend == "cpu":
        # XLA:CPU AOT artifacts bake in host CPU features; reloading them on
        # a different machine risks SIGILL (and CPU compiles are fast
        # anyway) — the persistent cache is for the slow TPU tunnel only
        return None
    cache_dir = cache_dir or os.environ.get("SH_TPU_COMPILE_CACHE",
                                            _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir

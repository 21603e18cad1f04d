"""semantichuman_tpu — TPU-native framework for semantic-aware disentangled
3D human body representation learning and editing.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
XiaokunSun/SemanticHuman (CVPR 2023): spiral-convolution mesh autoencoders
over fixed-topology human meshes with part-aware, skeleton-separated latent
decoupling, trained with geometric disentanglement losses, plus a semantic
editing suite (per-part girth scaling, bone length/orientation editing,
latent style transfer) and AOT serving bundles.

Layering (host vs device):
  * `topology`  — host-side "topology compiler": QEM mesh hierarchy,
                  barycentric upsampling (C++ AABB tree fast path), spiral
                  enumeration. Runs once, emits frozen arrays.
  * `ops`       — jittable JAX ops (spiral conv, pool/unpool, skeleton
                  algebra, distance/geometry kernels) + Pallas kernels.
  * `models`    — pure-functional JAX models (SpiralAE baseline, PartAE
                  flagship) with explicit param pytrees.
  * `train`     — fully-jitted fused loss stack + Trainer, orbax checkpoints.
  * `data`      — host data pipeline, synthetic assets, measurements.
  * `edit`      — the semantic editing suite (Editor).
  * `serving`   — StableHLO export / ServingBundle.
  * `parallel`  — device-mesh DP sharding + multi-host init.
  * `cli`       — make_synthetic / obj2npy / data_generation / train /
                  demo / export entry points.

Top-level conveniences (lazy imports): Config, Trainer, Editor,
ServingBundle.
"""

__version__ = "0.1.0"

_LAZY = {
    "Config": ("semantichuman_tpu.config", "Config"),
    "Trainer": ("semantichuman_tpu.train.loop", "Trainer"),
    "Editor": ("semantichuman_tpu.edit", "Editor"),
    "ServingBundle": ("semantichuman_tpu.serving", "ServingBundle"),
    "export_inference": ("semantichuman_tpu.serving", "export_inference"),
    "build_model": ("semantichuman_tpu.models", "build_model"),
    "compile_topology": ("semantichuman_tpu.topology", "compile_topology"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))

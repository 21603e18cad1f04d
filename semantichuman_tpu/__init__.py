"""semantichuman_tpu — TPU-native framework for semantic-aware disentangled
3D human body representation learning and editing.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
XiaokunSun/SemanticHuman (CVPR 2023): spiral-convolution mesh autoencoders
over fixed-topology human meshes with part-aware, skeleton-separated latent
decoupling, trained with geometric disentanglement losses, plus a semantic
editing suite (per-part girth scaling, bone length/orientation editing,
latent style transfer).

Layering (host vs device):
  * `topology`  — host-side "topology compiler": QEM mesh hierarchy, barycentric
                  upsampling, spiral enumeration. Runs once, emits frozen arrays.
  * `ops`       — jittable JAX ops (spiral conv, pool/unpool, skeleton algebra,
                  distance kernels) + Pallas perf kernels.
  * `models`    — flax models (SpiralAE baseline, PartAE flagship).
  * `train`     — fully-jitted loss stack + train/eval loops, orbax checkpoints.
  * `data`      — host data pipeline, preprocessing CLIs, synthetic assets.
  * `parallel`  — device-mesh/data-parallel sharding utilities.
"""

__version__ = "0.1.0"

"""Command-line entry points.

  python -m semantichuman_tpu.cli.make_synthetic  # synthetic dataset+assets
  python -m semantichuman_tpu.cli.obj2npy         # OBJ frames -> npy stacks
  python -m semantichuman_tpu.cli.data_generation # npy -> per-sample layout
  python -m semantichuman_tpu.cli.train           # train + eval + export
  python -m semantichuman_tpu.cli.demo            # latent editing demo

Replaces the reference's two argparse scripts + two module-level entry
scripts (obj2npy.py, data_generation.py, main.py, demo.py)."""

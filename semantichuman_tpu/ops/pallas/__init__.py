"""Pallas TPU kernels (perf tier). Importing this package must stay safe on
non-TPU backends — callers fall back to the XLA ops on ImportError."""

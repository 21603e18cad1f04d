"""Subprocess helper for the multi-host (2-process) CPU training test.

Runs a short synthetic training on a virtual CPU mesh and prints one JSON
line {"val": ..., "param_sum": ...}.  In distributed mode (--num_processes
> 1) each process owns --devices virtual CPU devices and the SAME global
mesh spans both; the result must equal the single-process run with the
same total device count (tests/test_distributed.py asserts it).
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--num_processes", type=int, default=1)
    ap.add_argument("--coordinator", default="localhost:12421")
    ap.add_argument("--devices", type=int, required=True,
                    help="virtual CPU devices for THIS process")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=1,
                    help="train through this epoch (inclusive)")
    ap.add_argument("--ck_frequency", type=int, default=100)
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir to resume from (lifecycle test)")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    if args.num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        from semantichuman_tpu.parallel.distributed import (
            initialize_distributed)
        initialize_distributed(args.coordinator, args.num_processes,
                               args.rank)
        assert jax.process_count() == args.num_processes

    import jax.numpy as jnp

    from semantichuman_tpu.config import Config
    from semantichuman_tpu.train.loop import Trainer

    cfg = Config.from_dict({
        "model": {
            "filter_sizes_enc": [[3, 8, 8, 16, 16], [[], [], [], [], []]],
            "filter_sizes_dec": [[16, 16, 8, 8, 8], [[], [], [], [], 3]],
            "use_pallas": False,
        },
        "data": {"synthetic": True, "synthetic_train": 16,
                 "synthetic_test": 8, "synthetic_n_theta": 16,
                 "synthetic_n_phi": 36, "normalization": "zeroroot"},
        "train": {"n_epochs": args.epochs, "batch_train": 8,
                  "batch_interp": 8, "batch_test": 8,
                  "ck_frequency": args.ck_frequency,
                  "save_recons": False, "resume": args.resume},
    })
    trainer = Trainer(cfg, args.workdir)
    start = trainer.start_epoch
    trainer.fit()
    val = trainer.validate()

    import numpy as np

    def _host(x):
        """Local replica of a (possibly non-fully-addressable) param."""
        try:
            return np.asarray(x.addressable_data(0))
        except (AttributeError, IndexError):
            return np.asarray(x)

    leaves = [_host(x) for x in jax.tree.leaves(trainer.params)]
    param_sum = float(sum(np.sum(np.abs(l)) for l in leaves))
    # a parameter FINGERPRINT (position-sensitive, not just the sum) so the
    # lifecycle test can assert exact state equality between resumed and
    # uninterrupted runs
    fingerprint = float(sum(
        np.sum(l * np.cos(np.arange(l.size, dtype=np.float32)
                          .reshape(l.shape) * 0.37))
        for l in leaves))
    print(json.dumps({"rank": args.rank, "val": val,
                      "param_sum": param_sum,
                      "fingerprint": fingerprint,
                      "start_epoch": start}), flush=True)


if __name__ == "__main__":
    sys.exit(main())

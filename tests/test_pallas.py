"""Pallas fused spiral-conv kernel: math validated in interpret mode on CPU
(the real-TPU path is probe-gated at runtime, see
ops/pallas/spiral_conv_pallas.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from semantichuman_tpu.ops.spiral_conv import spiral_conv
from semantichuman_tpu.ops.pallas.spiral_conv_pallas import (
    spiral_conv_auto, spiral_conv_fused)


@pytest.mark.parametrize("activation", ["elu", "relu", "identity"])
def test_fused_kernel_matches_xla_interpret(activation):
    rng = np.random.default_rng(0)
    b, v1, s, c, co = 2, 40, 6, 8, 16
    x = rng.standard_normal((b, v1, c)).astype(np.float32)
    x[:, -1] = 0.0                                    # dummy row
    idx = rng.integers(0, v1, (v1, s)).astype(np.int32)
    w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)

    ref = spiral_conv(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
                      jnp.asarray(bias), activation)
    got = spiral_conv_fused(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
                            jnp.asarray(bias), activation, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got)[:, -1], 0.0)


def test_auto_path_always_correct():
    """spiral_conv_auto must be numerically right whichever backend the
    probe picks on this platform."""
    rng = np.random.default_rng(1)
    b, v1, s, c, co = 3, 30, 5, 4, 8
    x = rng.standard_normal((b, v1, c)).astype(np.float32)
    x[:, -1] = 0.0
    idx = rng.integers(0, v1, (v1, s)).astype(np.int32)
    w = (rng.standard_normal((s * c, co)) * 0.1).astype(np.float32)
    bias = rng.standard_normal(co).astype(np.float32)
    ref = spiral_conv(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
                      jnp.asarray(bias), "elu")
    got = spiral_conv_auto(jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w),
                           jnp.asarray(bias), "elu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

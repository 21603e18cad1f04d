"""SpiralAE — the neural3DMM-style baseline autoencoder
(reference: models.py:55-162, model_type='neural3DMM').

Encoder: spiral convs + pool per level, flatten, one dense -> z.
Decoder: dense -> coarse grid, unpool + spiral convs per level (identity
activation on the final conv).  Optional VAE reparameterization.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.spiral_conv import spiral_conv
from ..utils.seeding import as_seed as _as_seed
from .common import (decoder_trunk, encoder_trunk, init_conv_stack,
                     linear_init, plan_conv_stack)
from .tables import DeviceTables


class SpiralAE:
    def __init__(self, tables: DeviceTables, filters_enc, filters_dec,
                 latent_size: int, vae: bool = False, compute_dtype=None,
                 conv_fn=spiral_conv):
        self.tables = tables
        self.latent_size = latent_size
        self.vae = vae
        self.compute_dtype = compute_dtype
        self.conv_fn = conv_fn
        n_levels = tables.n_levels
        self.enc_plan, enc_out = plan_conv_stack(
            filters_enc[0], filters_enc[1], tables.spiral_sizes, n_levels,
            decoder=False)
        self.dec_plan, _ = plan_conv_stack(
            filters_dec[0], filters_dec[1], tables.spiral_sizes, n_levels,
            decoder=True)
        self.enc_out_c = enc_out
        self.dec_in_c = filters_dec[0][0]
        self.coarse_rows = tables.sizes[-1] + 1

    def init(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(_as_seed(seed))
        enc_flat = self.coarse_rows * self.enc_out_c
        z_out = 2 * self.latent_size if self.vae else self.latent_size
        w_enc, b_enc = linear_init(rng, enc_flat, (enc_flat, z_out), (z_out,))
        dec_flat = self.coarse_rows * self.dec_in_c
        w_dec, b_dec = linear_init(rng, self.latent_size,
                                   (self.latent_size, dec_flat), (dec_flat,))
        params = {
            "conv": init_conv_stack(rng, self.enc_plan,
                                    self.tables.spiral_sizes),
            "dconv": init_conv_stack(rng, self.dec_plan,
                                     self.tables.spiral_sizes),
            "fc_enc": {"w": w_enc, "b": b_enc},
            "fc_dec": {"w": w_dec, "b": b_dec},
        }
        return jax.tree.map(jnp.asarray, params)

    def encode(self, params, x, rng=None):
        h = encoder_trunk(params["conv"], self.enc_plan, self.tables, x,
                          self.compute_dtype, self.conv_fn)
        h = h.reshape(h.shape[0], -1)
        z = h @ params["fc_enc"]["w"] + params["fc_enc"]["b"]
        if self.vae:
            mu, logvar = z[..., :self.latent_size], z[..., self.latent_size:]
            if rng is None:
                return mu
            std = jnp.exp(logvar / 2.0)
            eps = jax.random.normal(rng, std.shape, std.dtype)
            return mu + eps * std
        return z

    def decode(self, params, z):
        h = z @ params["fc_dec"]["w"] + params["fc_dec"]["b"]
        h = h.reshape(z.shape[0], self.coarse_rows, self.dec_in_c)
        return decoder_trunk(params["dconv"], self.dec_plan, self.tables, h,
                             self.compute_dtype, self.conv_fn)

    def __call__(self, params, x, rng=None):
        z = self.encode(params, x, rng)
        return self.decode(params, z), z

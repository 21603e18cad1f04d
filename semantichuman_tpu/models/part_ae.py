"""PartAE — the paper's part-aware, skeleton-separated autoencoder
(reference: models.py:166-310, model_type='multiz+partkps').

Same spiral-conv trunk as SpiralAE, but the bottleneck is per-part:
  * 17 shape heads: coarse-level features of each part's vertices -> 8-d z;
  * 17 pose heads: each part's keypoint group coords -> 8-d z_kps;
  * decode: per-part Linear(16 -> n_part·C) -> scatter back into mesh vertex
    order -> append dummy -> unpool+conv trunk.

TPU-native head layout: instead of 17 ragged nn.Linear modules
(reference models.py:200-204), parts are padded to a common max vertex count
and all heads run as ONE batched einsum [17, n_max·C, 8] on the MXU.  Padded
positions gather the (always-zero) coarse dummy row, so the padded weight
columns multiply zeros and the math is exactly the ragged math.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.skeleton import kps2skl  # re-exported for API parity
from ..ops.spiral_conv import spiral_conv
from ..utils.seeding import as_seed as _as_seed
from .common import (decoder_trunk, encoder_trunk, init_conv_stack,
                     linear_init, plan_conv_stack)
from .tables import DeviceTables


class PartAE:
    def __init__(self, tables: DeviceTables, part_indices: dict,
                 kps_index_list, filters_enc, filters_dec,
                 latent_size: int = 8, part_kps_latent_size: int = 8,
                 compute_dtype=None, conv_fn=spiral_conv):
        self.tables = tables
        self.latent_size = latent_size
        self.kps_latent_size = part_kps_latent_size
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

        # --- padded part layout at the coarsest level -----------------------
        self.part_names = list(part_indices.keys())
        plist = [np.asarray(part_indices[k], dtype=np.int32)
                 for k in self.part_names]
        self.part_sizes = [len(p) for p in plist]
        self.n_parts = len(plist)
        coarse_v = tables.sizes[-1]
        self.coarse_v = coarse_v
        n_max = max(self.part_sizes)
        self.n_max = n_max
        pad_idx = np.full((self.n_parts, n_max), coarse_v, dtype=np.int32)
        pad_mask = np.zeros((self.n_parts, n_max), dtype=np.float32)
        for p, idx in enumerate(plist):
            pad_idx[p, :len(idx)] = idx
            pad_mask[p, :len(idx)] = 1.0
        self.part_pad_idx = jnp.asarray(pad_idx)
        self.part_pad_mask = jnp.asarray(pad_mask)
        # scatter target for decode: padded slots dump into the trash row V
        self.scatter_idx = jnp.asarray(pad_idx.reshape(-1))

        # --- padded keypoint-group layout -----------------------------------
        self.kps_index_list = [list(g) for g in kps_index_list]
        g_max = max(len(g) for g in self.kps_index_list)
        self.g_max = g_max
        kidx = np.zeros((self.n_parts, g_max), dtype=np.int32)
        kmask = np.zeros((self.n_parts, g_max), dtype=np.float32)
        for p, g in enumerate(self.kps_index_list):
            kidx[p, :len(g)] = g
            kmask[p, :len(g)] = 1.0
        self.kps_pad_idx = jnp.asarray(kidx)
        self.kps_pad_mask = jnp.asarray(kmask)

    # --- params ---------------------------------------------------------------
    def init(self, seed: int = 0) -> dict:
        rng = np.random.default_rng(_as_seed(seed))
        c = self.enc_out_c
        nz, nk = self.latent_size, self.kps_latent_size
        # per-part heads, padded: init bound from each part's TRUE fan-in
        w_enc = np.zeros((self.n_parts, self.n_max * c, nz), np.float32)
        b_enc = np.zeros((self.n_parts, nz), np.float32)
        w_dec = np.zeros((self.n_parts, nz + nk, self.n_max * self.dec_in_c),
                         np.float32)
        b_dec = np.zeros((self.n_parts, self.n_max * self.dec_in_c), np.float32)
        w_kps = np.zeros((self.n_parts, self.g_max * 3, nk), np.float32)
        b_kps = np.zeros((self.n_parts, nk), np.float32)
        for p in range(self.n_parts):
            n_p = self.part_sizes[p]
            g_p = len(self.kps_index_list[p])
            we, be = linear_init(rng, n_p * c, (n_p * c, nz), (nz,))
            w_enc[p, :n_p * c] = we
            b_enc[p] = be
            wd, bd = linear_init(rng, nz + nk,
                                 (nz + nk, n_p * self.dec_in_c),
                                 (n_p * self.dec_in_c,))
            w_dec[p, :, :n_p * self.dec_in_c] = wd
            b_dec[p, :n_p * self.dec_in_c] = bd
            wk, bk = linear_init(rng, g_p * 3, (g_p * 3, nk), (nk,))
            w_kps[p, :g_p * 3] = wk
            b_kps[p] = bk
        params = {
            "conv": init_conv_stack(rng, self.enc_plan,
                                    self.tables.spiral_sizes),
            "dconv": init_conv_stack(rng, self.dec_plan,
                                     self.tables.spiral_sizes),
            "enc_heads": {"w": w_enc, "b": b_enc},
            "dec_heads": {"w": w_dec, "b": b_dec},
            "kps_heads": {"w": w_kps, "b": b_kps},
        }
        return jax.tree.map(jnp.asarray, params)

    # --- apply ------------------------------------------------------------------
    def kps_encode(self, params, kps):
        """kps [B, 32, 3] kept keypoints -> z_kps [B, P, nk]."""
        b = kps.shape[0]
        g = jnp.take(kps, self.kps_pad_idx.reshape(-1), axis=1)
        g = g.reshape(b, self.n_parts, self.g_max, 3)
        g = g * self.kps_pad_mask[None, :, :, None]
        g = g.reshape(b, self.n_parts, self.g_max * 3)
        hp = params["kps_heads"]
        return jnp.einsum("bpk,pkl->bpl", g, hp["w"]) + hp["b"][None]

    def encode(self, params, x, kps):
        """x [B, V+1, 3], kps [B, 32, 3] ->
        (z [B, P, nz], z_kps [B, P, nk], dummy [B, 1, C])."""
        h = encoder_trunk(params["conv"], self.enc_plan, self.tables, x,
                          self.compute_dtype, self.conv_fn)
        b = h.shape[0]
        # padded per-part feature blocks; pads hit the zeroed dummy row
        g = jnp.take(h, self.part_pad_idx.reshape(-1), axis=1)
        g = g.reshape(b, self.n_parts, self.n_max * self.enc_out_c)
        hp = params["enc_heads"]
        z = jnp.einsum("bpk,pkl->bpl", g, hp["w"]) + hp["b"][None]
        z_kps = self.kps_encode(params, kps)
        return z, z_kps, h[:, -1:, :]

    def decode(self, params, z, z_kps, dummy):
        """z [B, P, nz], z_kps [B, P, nk], dummy [B, 1, C] -> [B, V+1, 3]."""
        b = z.shape[0]
        zz = jnp.concatenate([z, z_kps], axis=-1)            # [B, P, nz+nk]
        hp = params["dec_heads"]
        y = jnp.einsum("bpl,plk->bpk", zz, hp["w"]) + hp["b"][None]
        y = y.reshape(b, self.n_parts * self.n_max, self.dec_in_c)
        # scatter part blocks back to coarse mesh vertex order; padded slots
        # land on the extra trash row V, replaced by the encoder dummy below
        out = jnp.zeros((b, self.coarse_v + 1, self.dec_in_c), y.dtype)
        out = out.at[:, self.scatter_idx, :].set(y)
        out = jnp.concatenate([out[:, :self.coarse_v], dummy], axis=1)
        return decoder_trunk(params["dconv"], self.dec_plan, self.tables, out,
                             self.compute_dtype, self.conv_fn)

    def __call__(self, params, x, kps):
        z, z_kps, dummy = self.encode(params, x, kps)
        return self.decode(params, z, z_kps, dummy), z, z_kps

    @staticmethod
    def kps2skl(kps, mode: str = "ori_m"):
        return kps2skl(kps, mode)

"""PyTorch-CPU baseline: the reference's computational recipe, timed.

Implements the reference architecture the way the reference computes it
(models.py:166-310 + main.py:183-193 in /root/reference): advanced-indexing
gather + nn.Linear spiral convs, *densified* [V+1, V'+1] batch-matmul
down/up-sampling, and Python loops over 17 per-part Linear heads.  Written
from the architectural description (SURVEY.md §3.3) — no reference code is
copied.  This is the denominator for bench.py's `vs_baseline`:
PyTorch-CPU meshes/sec of the same fwd+bwd+Adam training step.
"""

from __future__ import annotations

import json
import os
import platform
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "torch_cpu_baseline.json")


def build_torch_model(hier, coarse_parts, kps_index_list,
                      enc_filters, dec_filters, nz=8, nk=8):
    import torch
    import torch.nn as nn

    spirals = [torch.as_tensor(np.asarray(s, np.int64)) for s in hier.spirals]
    sizes = list(hier.sizes)
    L = len(sizes) - 1

    # densified D/U with dummy row/col, corner = 1 (reference main.py:183-193)
    def dense_down(l):
        vf, vc = sizes[l], sizes[l + 1]
        m = np.zeros((vc + 1, vf + 1), np.float32)
        m[np.arange(vc), hier.pool_idx[l][:-1]] = 1.0
        m[-1, -1] = 1.0
        return torch.as_tensor(m)

    def dense_up(l):
        vf, vc = sizes[l], sizes[l + 1]
        m = np.zeros((vf + 1, vc + 1), np.float32)
        rows = np.repeat(np.arange(vf), 3)
        m[rows, hier.unpool_idx[l][:-1].reshape(-1)] = \
            hier.unpool_w[l][:-1].reshape(-1)
        m[-1, -1] = 1.0
        return torch.as_tensor(m)

    D = [dense_down(l) for l in range(L)]
    U = [dense_up(l) for l in range(L)]

    class SpiralConvT(nn.Module):
        def __init__(self, c_in, c_out, spiral, activation="elu"):
            super().__init__()
            self.register_buffer("spiral", spiral)
            self.lin = nn.Linear(spiral.shape[1] * c_in, c_out)
            self.activation = activation

        def forward(self, x):
            b, v1, c = x.shape
            g = x[:, self.spiral.reshape(-1)].reshape(b, v1, -1)
            y = self.lin(g)
            if self.activation == "elu":
                y = torch.nn.functional.elu(y)
            mask = torch.ones(v1, 1, device=x.device)
            mask[-1] = 0
            return y * mask

    class PartAET(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc = nn.ModuleList(
                [SpiralConvT(enc_filters[i], enc_filters[i + 1], spirals[i])
                 for i in range(L)])
            self.dec = nn.ModuleList(
                [SpiralConvT(dec_filters[i], dec_filters[i + 1],
                             spirals[L - 1 - i]) for i in range(L)])
            # final conv uses identity activation (reference models.py:275-281)
            self.dec_out = SpiralConvT(dec_filters[L], 3, spirals[0],
                                       activation="identity")
            c = enc_filters[-1]
            self.parts = [np.asarray(v) for v in coarse_parts.values()]
            self.enc_heads = nn.ModuleList(
                [nn.Linear(len(p) * c, nz) for p in self.parts])
            self.kps_heads = nn.ModuleList(
                [nn.Linear(len(g) * 3, nk) for g in kps_index_list])
            self.dec_heads = nn.ModuleList(
                [nn.Linear(nz + nk, len(p) * dec_filters[0])
                 for p in self.parts])
            self.kps_groups = [np.asarray(g) for g in kps_index_list]
            self.c = c

        def forward(self, x, kps):
            for i in range(L):
                x = self.enc[i](x)
                x = torch.matmul(D[i], x)
            b = x.shape[0]
            z = torch.stack(
                [h(x[:, torch.as_tensor(p)].reshape(b, len(p) * self.c))
                 for h, p in zip(self.enc_heads, self.parts)], dim=1)
            z_kps = torch.stack(
                [h(kps[:, torch.as_tensor(g)].reshape(b, -1))
                 for h, g in zip(self.kps_heads, self.kps_groups)], dim=1)
            dummy = x[:, -1:]
            zz = torch.cat([z, z_kps], dim=-1)
            y = torch.zeros(b, sizes[-1] + 1, dec_filters[0])
            for k, (h, p) in enumerate(zip(self.dec_heads, self.parts)):
                if len(p):
                    y[:, torch.as_tensor(p)] = h(zz[:, k]).reshape(
                        b, len(p), dec_filters[0])
            y = torch.cat([y[:, :-1], dummy], dim=1)
            for i in range(L):
                y = torch.matmul(U[L - 1 - i], y)
                y = self.dec[i](y)
            return self.dec_out(y), z, z_kps

    return PartAET()


def measure(hier, coarse_parts, kps_index_list, j_regressor, kps_keep,
            verts: np.ndarray, batch_size: int = 4, warmup: int = 2,
            iters: int = 8) -> dict:
    """Time fwd+bwd+Adam of the torch reference-recipe model on CPU."""
    import torch

    torch.manual_seed(0)
    model = build_torch_model(hier, coarse_parts, kps_index_list,
                              enc_filters=[3, 16, 32, 64, 128],
                              dec_filters=[128, 64, 32, 32, 16])
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=5e-5)
    jreg = torch.as_tensor(np.asarray(j_regressor, np.float32))
    keep = torch.as_tensor(np.asarray(kps_keep, np.int64))

    x = torch.as_tensor(verts[:batch_size].astype(np.float32))
    x = torch.cat([x, torch.zeros(batch_size, 1, 3)], dim=1)

    def step():
        opt.zero_grad()
        kps = torch.matmul(jreg, x[:, :-1])[:, keep]
        rec, _z, _zk = model(x, kps)
        loss = torch.mean(torch.abs(rec - x))
        loss.backward()
        opt.step()
        return float(loss.detach())

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    mps = batch_size * iters / dt
    return {"meshes_per_sec": mps, "batch_size": batch_size,
            "iters": iters, "sec_per_step": dt / iters,
            "machine": platform.processor() or platform.machine(),
            "threads": torch.get_num_threads()}


def get_or_measure(hier, coarse_parts, kps_index_list, j_regressor, kps_keep,
                   verts, force: bool = False) -> dict:
    if not force and os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)
    res = measure(hier, coarse_parts, kps_index_list, j_regressor, kps_keep,
                  verts)
    with open(CACHE, "w") as f:
        json.dump(res, f, indent=1)
    return res


def reference_state_dict(model) -> dict:
    """Rename this torch model's state dict into the REFERENCE's key layout
    (conv.{i}.conv.*, fc_latent_enc_list.{p}.*, ...) so it doubles as a
    fixture for the checkpoint importer (utils/import_torch.py)."""
    import torch

    sd = model.state_dict()
    out = {}
    n_enc = len(model.enc)
    n_dec = len(model.dec)
    for k, v in sd.items():
        if k.endswith(".spiral"):
            continue
        if k.startswith("enc."):
            i = int(k.split(".")[1])
            out[f"conv.{i}.conv.{k.split('.')[-1]}"] = v
        elif k.startswith("dec_out."):
            out[f"dconv.{n_dec}.conv.{k.split('.')[-1]}"] = v
        elif k.startswith("dec."):
            i = int(k.split(".")[1])
            out[f"dconv.{i}.conv.{k.split('.')[-1]}"] = v
        elif k.startswith("enc_heads."):
            p = int(k.split(".")[1])
            out[f"fc_latent_enc_list.{p}.{k.split('.')[-1]}"] = v
        elif k.startswith("dec_heads."):
            p = int(k.split(".")[1])
            out[f"fc_latent_dec_list.{p}.{k.split('.')[-1]}"] = v
        elif k.startswith("kps_heads."):
            p = int(k.split(".")[1])
            out[f"kps_enc_list.{p}.{k.split('.')[-1]}"] = v
        else:
            raise KeyError(f"unmapped torch key {k}")
    return out

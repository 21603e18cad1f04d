"""Host data pipeline.

Replaces the reference's torch Dataset/DataLoader stack (shape_data.py,
autoencoder_dataset.py) with a TPU-oriented design:

  * `MeshData` — dataset container: monolithic [N, V, 3] arrays (memory-
    mapped), template mesh, split handling, normalization statistics, mesh
    export (reference: shape_data.py).
  * `BatchLoader` — seeded-shuffle batched iterator applying the reference's
    substring-matched normalization modes, NaN scrubbing, dummy-vertex
    append and measure vectors (reference: autoencoder_dataset.py:26-56),
    vectorized per batch instead of per sample.
  * `prefetch_to_device` — stages batches onto the device ahead of compute
    (replaces DataLoader worker processes; on TPU the wins come from
    overlapping H2D copies, not from forking Python).

Both on-disk layouts are supported: the per-sample
`points_{split}/NNNNNN.npy` + `paths_{split}.npy` layout produced by the
preprocessing CLI, and direct `preprocessed/{train,test}.npy` arrays
(memmapped, preferred).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..topology.obj_io import load_obj, save_obj


@dataclass
class ShapeStats:
    mean: np.ndarray | None = None     # 'gass': per-vertex mean/std of train
    std: np.ndarray | None = None
    center: np.ndarray | None = None   # 'normal': per-sample bbox center
    scale: np.ndarray | None = None    # 'normal': per-sample 1/bbox-extent


class MeshData:
    """Dataset container for one fixed-topology mesh dataset."""

    def __init__(self, root_dir: str, n_val: int = 0,
                 normalization: str = "No", mmap: bool = True):
        self.root_dir = root_dir
        self.normalization = normalization
        pre = os.path.join(root_dir, "preprocessed")
        mode = "r" if mmap else None
        train = np.load(os.path.join(pre, "train.npy"), mmap_mode=mode)
        self.vertices_train = train[:len(train) - n_val]
        self.vertices_val = train[len(train) - n_val:]
        test_path = os.path.join(pre, "test.npy")
        self.vertices_test = (np.load(test_path, mmap_mode=mode)
                              if os.path.exists(test_path) else None)
        self.n_vertex = self.vertices_train.shape[1]
        self.n_features = self.vertices_train.shape[2]
        tpl = os.path.join(root_dir, "template", "template.obj")
        self.template_verts, self.template_faces = load_obj(tpl)
        self.stats = self._compute_stats()

    def _compute_stats(self) -> ShapeStats:
        return compute_stats(self.vertices_train, self.vertices_test,
                             self.normalization)

    def save_meshes(self, prefix: str, meshes: np.ndarray, indices,
                    vert_colors=None, kps=None, skl_list=None):
        """Export reconstructed meshes as OBJ (reference: shape_data.py:86-145).
        Undoes 'gass'/'normal' normalization using stored stats."""
        for i in range(len(meshes)):
            v = meshes[i].reshape(self.n_vertex, self.n_features)
            if self.normalization == "gass":
                v = v * self.stats.std + self.stats.mean
            elif self.normalization == "normal":
                v = v / self.stats.scale[indices[i]] \
                    + self.stats.center[indices[i]]
            save_obj(f"{prefix}_{str(int(indices[i])).zfill(6)}.obj", v,
                     self.template_faces, vert_colors=vert_colors,
                     kps=None if kps is None else kps[i], skl_list=skl_list)


class ArraySource:
    """Batch source over an in-memory / memmapped [N, V, 3] array."""

    def __init__(self, verts: np.ndarray, measures: np.ndarray | None = None):
        self.verts = verts
        self.measures = measures

    def __len__(self):
        return len(self.verts)

    def take(self, idx: np.ndarray) -> dict:
        out = {"verts": np.asarray(self.verts[idx], dtype=np.float32),
               "idx": idx}
        if self.measures is not None:
            out["measure"] = np.asarray(self.measures[idx], dtype=np.float32)
        return out


class FileSource:
    """Batch source over the per-sample `points_{split}/` directory layout."""

    def __init__(self, root_dir: str, split: str, measure: bool = False):
        self.root = root_dir
        self.split = split
        self.names = [str(n) for n in
                      np.load(os.path.join(root_dir, f"paths_{split}.npy"))]
        self.measure = measure

    def __len__(self):
        return len(self.names)

    def take(self, idx: np.ndarray) -> dict:
        pts = np.stack([
            np.load(os.path.join(self.root, f"points_{self.split}",
                                 self.names[i] + ".npy"))
            for i in idx]).astype(np.float32)
        out = {"verts": pts, "idx": idx}
        if self.measure:
            out["measure"] = np.stack([
                np.load(os.path.join(self.root, f"measure_{self.split}",
                                     self.names[i] + ".npy"))
                for i in idx]).astype(np.float32)
        return out


def compute_stats(train_verts, test_verts, normalization: str) -> ShapeStats:
    """Normalization statistics (substring-matched modes compose, like
    normalize_batch)."""
    s = ShapeStats()
    if "gass" in normalization:
        s.mean = np.mean(train_verts, axis=0)
        std = np.std(train_verts, axis=0)
        # (near-)zero-variance coordinates (possible on synthetic templates;
        # never on DFAUST, so the reference divides unguarded) would blow up
        # to ±inf / float-noise amplified by 1/std — map them to the
        # identity scale instead (1e-8 m is far below any real mesh std)
        s.std = np.where(std < 1e-8, 1.0, std)
    if "normal" in normalization:
        # 'normal' is an eval-time mode: per-sample per-axis bbox stats
        # of the TEST split, indexed by test-sample id (reference:
        # shape_data.py:44-47 — its quirk, kept deliberately; using it
        # on train indices beyond len(test) is an error there too)
        if test_verts is None:
            raise ValueError(
                "'normal' normalization needs a test split "
                "(preprocessed/test.npy) to compute per-sample stats")
        s.center = (np.max(test_verts, axis=1) + np.min(test_verts, axis=1)) / 2
        s.scale = 1.0 / (np.max(test_verts, axis=1) - np.min(test_verts, axis=1))
    return s


def unnormalize_batch(verts: np.ndarray, normalization: str,
                      stats: ShapeStats | None = None,
                      idx: np.ndarray | None = None) -> np.ndarray:
    """Invert the SCALING normalization modes ('gass', 'normal') on
    [B, V, 3] vertices (no dummy row) so eval metrics are true millimeters.

    The reference defines this as `unnormal` (test_funcs.py:9-15 /
    train_funcs.py:46) but never calls it — its `unnormal_flag` parameter
    is accepted and ignored, so the published mm metric is computed in
    normalized coordinates whenever gass/normal training is used.  Here the
    inverse is live (Trainer.evaluate).  Rigid translations (zeromean /
    zeroroot) cancel in vertex differences and are not inverted."""
    v = verts
    if "normal" in normalization:
        v = v / stats.scale[idx][:, None, :] + stats.center[idx][:, None, :]
    if "gass" in normalization:
        v = v * stats.std + stats.mean
    return v


def normalize_batch(verts: np.ndarray, normalization: str,
                    j_regressor: np.ndarray | None = None,
                    stats: ShapeStats | None = None,
                    idx: np.ndarray | None = None) -> np.ndarray:
    """Substring-matched normalization modes, vectorized over the batch
    (reference: autoencoder_dataset.py:29-43)."""
    v = verts
    if "zeromean" in normalization:
        v = v - np.mean(v, axis=1, keepdims=True)
    if "zeroroot" in normalization:
        root = np.einsum("v,bvd->bd", j_regressor[0], v)
        v = v - root[:, None, :]
    if "onelength" in normalization:
        ext = (np.max(v, axis=1) - np.min(v, axis=1))[:, 1]
        v = v / ext[:, None, None] * 1.5
    if "small" in normalization:
        v = v / 1.5
    if "gass" in normalization:
        v = (v - stats.mean) / stats.std
    if "normal" in normalization:
        # per-sample, per-AXIS bbox stats: center/scale are [N, 3]
        # (reference: shape_data.py:44-47, autoencoder_dataset.py:41-42)
        v = (v - stats.center[idx][:, None, :]) * stats.scale[idx][:, None, :]
    v = np.nan_to_num(v, nan=0.0)
    return v


class BatchLoader:
    """Seeded-shuffle batch iterator with normalization + dummy vertex."""

    def __init__(self, source, batch_size: int, shuffle: bool = False,
                 seed: int = 0, normalization: str = "No",
                 j_regressor: np.ndarray | None = None,
                 stats: ShapeStats | None = None, dummy_node: bool = True,
                 drop_last: bool = False, pad_final: bool = False,
                 process_slice: tuple[int, int] | None = None):
        self.source = source
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.normalization = normalization
        self.j_regressor = (None if j_regressor is None
                            else np.asarray(j_regressor, np.float32))
        self.stats = stats
        self.dummy_node = dummy_node
        self.drop_last = drop_last
        self.pad_final = pad_final
        # (rank, world): every process iterates the SAME global batch order
        # (same seed/epoch) but loads only its contiguous slice of each
        # batch — the rows its mesh shard owns (process-major batch axis)
        self.process_slice = process_slice
        if process_slice is not None and batch_size % process_slice[1]:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"{process_slice[1]} processes")
        self.epoch = 0

    def __len__(self):
        n = len(self.source)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def iter_indices(self):
        """The batch SCHEDULE only: yields {global_idx, pad, valid} dicts
        (global, un-sliced) without touching the data — the device-resident
        pipeline (data.device_data) materializes batches from these."""
        n = len(self.source)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for s in range(0, stop, self.batch_size):
            idx = order[s:s + self.batch_size]
            pad = 0
            if self.pad_final and len(idx) < self.batch_size:
                pad = self.batch_size - len(idx)
                idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
            valid = np.ones(len(idx), np.float32)
            if pad:
                valid[-pad:] = 0.0
            yield {"global_idx": idx, "pad": pad, "valid": valid}

    def __iter__(self):
        for meta in self.iter_indices():
            idx, valid = meta["global_idx"], meta["valid"]
            pad = meta["pad"]
            global_idx = idx
            if self.process_slice is not None:
                r, w = self.process_slice
                if len(idx) % w:
                    raise ValueError(
                        f"batch of {len(idx)} not divisible by {w} processes "
                        "(use drop_last or pad_final with a divisible "
                        "batch_size)")
                per = len(idx) // w
                idx = idx[r * per:(r + 1) * per]
                valid = valid[r * per:(r + 1) * per]
            batch = self.source.take(idx)
            v = normalize_batch(batch["verts"], self.normalization,
                                self.j_regressor, self.stats, idx)
            if self.dummy_node:
                z = np.zeros((v.shape[0], 1, v.shape[2]), dtype=v.dtype)
                v = np.concatenate([v, z], axis=1)
            batch["verts"] = v
            batch["pad"] = pad              # GLOBAL pad count
            batch["valid"] = valid          # local rows' validity mask
            batch["global_idx"] = global_idx
            yield batch

    # each train epoch gets its own disjoint block of shuffle-seed epochs
    # for the endless interp/exc cycle, so a training run RESUMED at epoch
    # E draws exactly what the uninterrupted run drew in epoch E (the
    # free-running epoch bump is host state no checkpoint carries)
    EPOCH_ANCHOR_STRIDE = 1 << 16

    def cycle(self, anchor: int | None = None):
        """Endless iterator (the interp/exc loaders never exhaust).
        anchor=E makes the draw sequence a pure function of E (per-epoch
        deterministic, resume-safe) instead of carrying over."""
        if anchor is not None:
            self.epoch = anchor * self.EPOCH_ANCHOR_STRIDE
        while True:
            yield from self
            self.epoch += 1


def place_batch(batch: dict, sharding=None) -> dict:
    """Device-place a host batch: every non-object ndarray except the id
    vectors lands on device (sharded across the mesh when given); scalars
    and ids stay host-side.  THE single placement policy — the prefetch
    pipeline and Trainer._put both delegate here.

    Multi-process: each process holds only ITS rows of the global batch
    (BatchLoader process_slice), so placement assembles the global array
    via jax.make_array_from_process_local_data instead of device_put
    (which rejects non-addressable devices)."""
    import jax

    arrays = {k: v for k, v in batch.items()
              if isinstance(v, np.ndarray) and v.dtype != object
              and k not in ("idx", "global_idx")}
    rest = {k: v for k, v in batch.items() if k not in arrays}
    if sharding is not None and jax.process_count() > 1:
        arrays = {k: jax.make_array_from_process_local_data(sharding, v)
                  for k, v in arrays.items()}
    elif sharding is not None:
        arrays = {k: jax.device_put(v, sharding) for k, v in arrays.items()}
    else:
        arrays = {k: jax.device_put(v) for k, v in arrays.items()}
    return {**arrays, **rest}


def prefetch_to_device(iterator, size: int = 2, sharding=None,
                       threaded: bool = True):
    """Stage `size` batches ahead on device.  With a `sharding`, batches are
    laid out across the data-parallel mesh as they land.

    A background worker thread drives the host work (memmap reads,
    normalization, dummy append — the reference covers this with
    DataLoader(num_workers=4), main.py:213-237) AND the async H2D copy, so
    both overlap device compute instead of sitting on the critical path
    between steps.  numpy kernels and device transfers release the GIL, so
    one thread suffices at these batch sizes.  `threaded=False` (or
    size=0) falls back to inline staging."""
    if not threaded or size <= 0:
        import collections

        queue = collections.deque()
        for batch in iterator:
            queue.append(place_batch(batch, sharding))
            if len(queue) >= max(size, 1):
                yield queue.popleft()
        while queue:
            yield queue.popleft()
        return

    import queue as queue_mod
    import threading

    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    stop = threading.Event()
    sentinel = object()
    errors: list[BaseException] = []

    def worker():
        try:
            for batch in iterator:
                staged = place_batch(batch, sharding)
                while not stop.is_set():
                    try:
                        q.put(staged, timeout=0.1)
                        break
                    except queue_mod.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface loader errors to the consumer
            errors.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue_mod.Full:
                    continue

    t = threading.Thread(target=worker, name="sh-tpu-prefetch", daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if errors:
                    raise errors[0]
                return
            yield item
    finally:
        # consumer abandoned the generator (break/close): release the worker
        stop.set()

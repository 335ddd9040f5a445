"""Host batching: GT padding to static shapes + simple prefetching loader.

Replaces the reference's DataContainer/collate + (Distributed)GroupSampler
stack (``opera/datasets/builder.py:88-201``).  GT is padded to ``max_gt``
slots with a validity mask; batches group samples of the same padded bucket
so each bucket compiles once (the aspect-ratio grouping of the reference
generalizes to bucket grouping under static shapes).
"""
from __future__ import annotations

import threading
import queue as queue_mod
from typing import Iterator

import numpy as np


def pad_gt(sample: dict, max_gt: int, num_keypoints: int) -> dict:
    """Pad per-sample GT arrays to ``max_gt`` slots + validity mask."""
    out = dict(sample)
    kpts = sample.get("gt_keypoints",
                      np.zeros((0, num_keypoints, 3), np.float32))
    G = min(len(kpts), max_gt)
    pk = np.zeros((max_gt, num_keypoints, 3), np.float32)
    pa = np.zeros((max_gt,), np.float32)
    pv = np.zeros((max_gt,), bool)
    if G:
        pk[:G] = kpts[:G]
        pa[:G] = sample["gt_areas"][:G]
        pv[:G] = True
    out["gt_keypoints"] = pk
    out["gt_areas"] = np.maximum(pa, 1e-6)
    out["gt_valid"] = pv
    out["_row_valid"] = np.ones((), bool)
    if "gt_bboxes" in sample:
        pb = np.zeros((max_gt, 4), np.float32)
        if G:
            pb[:G] = sample["gt_bboxes"][:G]
        out["gt_bboxes"] = pb
    out.pop("gt_labels", None)
    return out


class PrebakedLoader:
    """Streams batches pre-serialized by ``tools/bake_batches.py``.

    The bake tool runs the REAL dataset + pipeline + :class:`ClipLoader`
    stack offline and writes every collated batch as an ``.npz``
    (``ep{k}_{i}.npz``); this loader just reads them back with a prefetch
    thread.  It exists for hosts where the python augmentation pipeline
    cannot keep up with the device (the 1-vCPU synthetic-teacher recipe:
    data_time ~0.7 s vs ~0.2 s device step — PERF_NOTES "host overhead"):
    once baked, per-step host cost is one uncompressed file read.

    Epoch ``e`` of training serves baked variant ``e % num_variants``
    with batch order reshuffled per epoch, so a run longer than the
    baked variants cycles augmentation variants (the underlying scenes
    already differ per clip; variants add aug diversity on top).
    """

    def __init__(self, root: str, shuffle: bool = True, seed: int = 0,
                 prefetch: int = 4):
        import glob
        import os
        import re
        files = sorted(glob.glob(os.path.join(root, "ep*_*.npz")))
        if not files:
            raise FileNotFoundError(
                f"no baked batches (ep*_*.npz) under {root!r} — run "
                "tools/bake_batches.py first")
        by_epoch: dict = {}
        for f in files:
            m = re.match(r"ep(\d+)_", os.path.basename(f))
            by_epoch.setdefault(int(m.group(1)), []).append(f)
        self.variants = [sorted(v) for _, v in sorted(by_epoch.items())]
        n0 = len(self.variants[0])
        if any(len(v) != n0 for v in self.variants):
            # tolerate a partially-baked last variant by dropping it
            self.variants = [v for v in self.variants if len(v) == n0]
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        return len(self.variants[0])

    @staticmethod
    def _load(path: str) -> dict:
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}

    def __iter__(self):
        files = list(self.variants[self.epoch % len(self.variants)])
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(files)
        self.epoch += 1
        if self.prefetch <= 0:
            for f in files:
                yield self._load(f)
            return
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()
        error = []

        def producer():
            try:
                for f in files:
                    q.put(self._load(f))
            except BaseException as e:
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                break
            yield item


class ClipLoader:
    """Iterates a dataset into model-ready batches.

    Groups samples by padded image shape (bucket) so a batch is a single
    static shape; optional background-thread prefetch overlaps the host
    pipeline with device steps.
    """

    def __init__(self, dataset, batch_size: int = 1, max_gt: int = 30,
                 num_keypoints: int = 15, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 num_shards: int = 1, shard_index: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.num_keypoints = num_keypoints
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx[self.shard_index::self.num_shards]

    def _sample(self, i):
        s = self.dataset[i]
        while s is None:  # pipeline dropped the sample (e.g. empty affine)
            s = self.dataset[np.random.randint(len(self.dataset))]
        return pad_gt(s, self.max_gt, self.num_keypoints)

    def _batches(self) -> Iterator[dict]:
        by_bucket = {}
        for i in self._indices():
            s = self._sample(i)
            key = s["img"].shape
            by_bucket.setdefault(key, []).append(s)
            if len(by_bucket[key]) == self.batch_size:
                yield self._collate(by_bucket.pop(key))
        if not self.drop_last:
            for group in by_bucket.values():
                while len(group) < self.batch_size:
                    # repeat-pad the tail batch; padded rows are marked
                    # invalid so eval never emits duplicate detections
                    pad = dict(group[-1])
                    pad["_row_valid"] = np.zeros((), bool)
                    group.append(pad)
                yield self._collate(group)

    @staticmethod
    def _collate(samples) -> dict:
        keys = samples[0].keys()
        return {k: np.stack([s[k] for s in samples], 0) for k in keys}

    def __iter__(self):
        self.epoch += 1
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()
        error = []

        def producer():
            try:
                for b in self._batches():
                    q.put(b)
            except BaseException as e:  # propagate to the consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                break
            yield item

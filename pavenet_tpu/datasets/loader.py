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

"""Mesh / multi-host plumbing tests (single-process semantics; multi-host
behavior is driver-validated via ``__graft_entry__.dryrun_multichip``)."""
import os

import numpy as np
import jax

from pavenet_tpu.parallel.mesh import (
    make_mesh, put_batch, maybe_init_distributed)
from pavenet_tpu.apis.test import gather_detections


def test_maybe_init_distributed_noop(monkeypatch):
    """No coordinator/slurm env -> stays single-process, returns False."""
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "PAVENET_DISTRIBUTED", "SLURM_NTASKS"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_init_distributed() is False
    assert jax.process_count() == 1


def test_gather_detections_single_process_identity():
    dets = [dict(image_id=1, category_id=1, score=0.5,
                 keypoints=[1.0, 2.0, 1.0])]
    assert gather_detections(dets) == dets


def test_put_batch_shards_leading_axis():
    mesh = make_mesh()
    n = len(jax.devices())
    batch = {"img": np.zeros((n, 2, 8, 8, 3), np.float32),
             "img_shape": np.tile(np.array([[8, 8]], np.int32), (n, 1))}
    out = put_batch(batch, mesh)
    assert out["img"].sharding.num_devices == n
    # each device holds a 1-sample slice of the batch axis
    assert out["img"].addressable_shards[0].data.shape[0] == 1


def test_loader_shards_are_disjoint_and_cover():
    """Process-sharded loaders must partition the index set (the
    DistributedGroupSampler contract, ``opera/datasets/builder.py:161``)."""
    from pavenet_tpu.datasets.loader import ClipLoader

    class _DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return dict(
                img=np.zeros((3, 8, 8, 3), np.float32),
                img_shape=np.array([8, 8], np.int32),
                scale_factor=np.ones(2, np.float32),
                image_id=i,
                gt_keypoints=np.zeros((1, 15, 3), np.float32),
                gt_areas=np.ones((1,), np.float32))

    seen = []
    for shard in range(2):
        loader = ClipLoader(_DS(), batch_size=1, shuffle=False, prefetch=0,
                            drop_last=False, num_shards=2,
                            shard_index=shard)
        seen.append([int(b["image_id"][0]) for b in loader])
    assert not set(seen[0]) & set(seen[1])
    assert sorted(seen[0] + seen[1]) == list(range(10))

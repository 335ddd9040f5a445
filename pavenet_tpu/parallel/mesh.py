"""Device mesh + sharding helpers.

The reference's only parallelism is data-parallel DDP over NCCL
(``opera/apis/train.py:157-162``, SURVEY.md §2.5).  Here data parallelism is
a one-axis ``jax.sharding.Mesh``: the clip/batch axis is sharded over
devices, parameters are replicated, and XLA inserts the gradient psum over
ICI where torch DDP ran NCCL all-reduce.  Loss normalizers that the
reference synced with ``reduce_mean`` fall out automatically because the
loss is computed over the *global* batch inside one jitted step.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh()``
(replaces ``init_dist``; see ``pavenet_tpu/apis/train.py``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for host batches: leading (batch) axis split over devices."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    sharding = shard_batch(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

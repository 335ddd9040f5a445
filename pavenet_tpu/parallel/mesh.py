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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(logger=None) -> bool:
    """Initialize ``jax.distributed`` when the environment indicates a
    multi-process run (the reference's ``init_dist``,
    ``mmcv/runner/dist_utils.py``: pytorch/slurm/mpi launchers).

    Triggers on an explicit coordinator address, a SLURM multi-task
    allocation, or ``PAVENET_DISTRIBUTED=1`` (TPU pods auto-detect).
    Safe no-op for single-process runs; returns whether distributed mode
    is active.
    """
    if jax.process_count() > 1:
        return True
    env = os.environ
    want = (env.get("JAX_COORDINATOR_ADDRESS")
            or env.get("COORDINATOR_ADDRESS")
            or env.get("PAVENET_DISTRIBUTED") == "1"
            or env.get("SLURM_NTASKS", "1") not in ("", "0", "1"))
    if not want:
        return False
    jax.distributed.initialize()
    if logger is not None:
        logger.info(f"jax.distributed: process {jax.process_index()}"
                    f"/{jax.process_count()}, "
                    f"{jax.local_device_count()} local devices")
    return jax.process_count() > 1


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
    """Device-put a host batch with the leading axis sharded over the mesh.

    Multi-host: each process holds its *local* slice of the global batch
    (the loader shards by ``jax.process_index()``); assemble the global
    array from the per-process shards — the SPMD equivalent of DDP's
    per-rank batches.
    """
    sharding = shard_batch(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

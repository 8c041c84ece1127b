"""Multi-host (multi-process) execution.

The reference scales beyond one machine with torch.distributed NCCL process
groups + per-rank dataset shards (train_tasks.py:269-278,
train_concap.py:281-294). The TPU-native equivalent (SURVEY.md §2.5):

- every host runs the SAME program; ``jax.distributed.initialize`` wires the
  processes into one runtime (auto-detected on TPU pods, explicit
  coordinator/num_processes/process_id elsewhere, e.g. CPU tests),
- the mesh spans ALL devices; params are replicated / sharded by the same
  NamedShardings as single-host,
- each host loads only its shard of every batch
  (``process_index``/``process_count`` drive the loader's
  shard_id/num_shards) and ``jax.make_array_from_process_local_data``
  assembles the logical global array — XLA then runs the usual compiled
  step; gradient psums ride ICI/DCN, no NCCL-style code.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[str] = None,
) -> None:
    """Join the multi-process runtime (torch.dist init_process_group
    equivalent, reference train_tasks.py:269-278).

    With no arguments on a TPU pod slice, everything is auto-detected from
    the TPU environment. No-op when num_processes in (None, 0, 1) and no
    coordinator is given — single-process runs stay untouched.
    """
    if coordinator_address is None and not num_processes:
        return
    kwargs: dict = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids:
        kwargs["local_device_ids"] = [
            int(x) for x in str(local_device_ids).split(",")
        ]
    jax.distributed.initialize(**kwargs)
    logger.info(
        "distributed runtime up: process %d/%d, %d/%d devices local",
        jax.process_index(), jax.process_count(),
        len(jax.local_devices()), len(jax.devices()),
    )


def process_shard() -> tuple:
    """(shard_id, num_shards) for host-side data loaders."""
    return jax.process_index(), jax.process_count()


def make_global_batch(
    batch: Any, mesh: Mesh, axis: str = "data", batch_axis: int = 0
) -> Any:
    """Assemble per-host local batches into one global batch-sharded array
    tree (jax.make_array_from_process_local_data over NamedSharding(P(axis)));
    the per-host shard of the reference's DistributedSampler, TPU-style.

    ``batch_axis`` selects which array axis carries the per-host batch shard
    (1 for grad-accum microbatches shaped [grad_accum, B_local, ...], where
    the scan axis 0 is identical across hosts).

    Single-process: equivalent to a sharded device_put (same code path keeps
    tests honest)."""
    def place(path, x):
        if isinstance(x, jax.Array) and not getattr(
            x, "is_fully_addressable", True
        ):
            # already a global array (the per-task device prefetch places
            # batches with this same function) — placement is idempotent
            return x
        x = np.asarray(x)
        if x.ndim <= batch_axis:
            raise ValueError(
                f"make_global_batch(batch_axis={batch_axis}): leaf "
                f"{jax.tree_util.keystr(path)} has shape {x.shape} with only "
                f"{x.ndim} axes — every leaf must carry the per-host batch "
                f"shard on axis {batch_axis} (reshape it before placement)"
            )
        spec_axes = [None] * x.ndim
        spec_axes[batch_axis] = axis
        sharding = NamedSharding(mesh, P(*spec_axes))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map_with_path(place, batch)


def make_global_batch_fn(mesh: Mesh, axis: str = "data", batch_axis: int = 0):
    """Partial of make_global_batch for prefetch pipelines."""
    return lambda batch: make_global_batch(batch, mesh, axis, batch_axis)

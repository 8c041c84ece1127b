"""Device mesh and sharding helpers.

The reference's entire distributed story is NCCL data parallelism
(SURVEY.md §2.5: apex DDP + DistributedSampler + per-rank LMDB shards).
Here the same capability — plus optional parameter sharding for large models
— is expressed through one ``jax.sharding.Mesh``:

- axis "data": batch dimension; gradient averaging becomes an XLA ``psum``
  compiled onto ICI,
- axis "model" (optional, size 1 by default): tensor-parallel sharding of the
  big matmuls for bert_large-and-up scaling.

Everything under jit; collectives are inserted by XLA from sharding
annotations (the scaling-book recipe), not written by hand.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] = (-1,),
    axes: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; a single -1 entry absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh {shape} needs {n} devices, have {len(devices)}"
    dev_array = np.array(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put every array in a batch pytree sharded along the data axis."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_pytree(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def param_sharding_rules(
    params: Any,
    mesh: Mesh,
    *,
    model_axis: str = "model",
    min_size_to_shard: int = 2**20,
) -> Any:
    """FSDP-ish rule: shard the largest dim of big params over the model axis
    when it divides evenly; replicate the rest. Returns a NamedSharding tree.

    With a size-1 (or absent) model axis this degenerates to full replication
    — the reference-equivalent pure-DP regime.
    """
    if model_axis not in mesh.axis_names or mesh.shape[model_axis] == 1:
        return jax.tree.map(lambda _: replicated(mesh), params)
    size = mesh.shape[model_axis]

    def rule(x):
        if x.ndim == 0 or x.size < min_size_to_shard:
            return replicated(mesh)
        dim = int(np.argmax(x.shape))
        if x.shape[dim] % size == 0:
            spec = [None] * x.ndim
            spec[dim] = model_axis
            return NamedSharding(mesh, P(*spec))
        return replicated(mesh)

    return jax.tree.map(rule, params)

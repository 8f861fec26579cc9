"""Device mesh + sharding helpers.

TPU-native replacement for the reference's legacy multi-GPU runtime: the
NCCL all-reduce towers and StagingArea pipelines
(.legacy/multi_gpu_pipeline/feedforward_pipeline.py:78-138,165-195) become a
``jax.sharding.Mesh`` with the batch sharded over a ``data`` axis —
gradient all-reduces are inserted by XLA and ride the ICI.

The model is ~5M params: data parallelism is the only sharding that pays for
itself (SURVEY.md §2.3). The mesh abstraction still accepts extra axes so a
future spatial/sequence axis drops in without touching the train step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shapes: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a device mesh. ``-1`` on one axis absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shapes = list(axis_shapes)
    if -1 in shapes:
        known = int(np.prod([s for s in shapes if s != -1])) or 1
        shapes[shapes.index(-1)] = len(devices) // known
    n = int(np.prod(shapes))
    arr = np.array(devices[:n]).reshape(shapes)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh, axis: str = "data"):
    """Device_put every leaf with its leading dim sharded over ``axis``."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)

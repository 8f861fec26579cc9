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
    if n > len(devices):
        raise ValueError(
            f"mesh axis_shapes {tuple(axis_shapes)} require {n} devices "
            f"but only {len(devices)} are available")
    if n < len(devices):
        print(f"make_mesh: using {n} of {len(devices)} devices "
              f"(axis_shapes {tuple(axis_shapes)} does not cover the rest)")
    arr = np.array(devices[:n]).reshape(shapes)
    return Mesh(arr, tuple(axis_names))


def make_hybrid_mesh(
    axis_names: Sequence[str] = ("dcn", "ici"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Multi-host mesh: leading axis spans processes (DCN), trailing axis
    spans each process's local devices (ICI).

    With the batch sharded over BOTH axes, XLA's gradient all-reduce
    decomposes into a fast intra-slice reduce over ICI and one inter-slice
    hop over DCN — the TPU-native equivalent of the legacy hierarchical NCCL
    reduction (.legacy/multi_gpu_pipeline/feedforward_pipeline.py:92-138).
    Single-process callers get a (1, n_devices) mesh, so code written against
    the hybrid axes runs unchanged on one host.
    """
    devs = sorted(devices if devices is not None else jax.devices(),
                  key=lambda d: (d.process_index, d.id))
    n_proc = max(jax.process_count(), 1)
    if len(devs) % n_proc:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"{n_proc} processes")
    arr = np.array(devs).reshape(n_proc, len(devs) // n_proc)
    return Mesh(arr, tuple(axis_names))


def distributed_init(coordinator_address: str, num_processes: int,
                     process_id: int) -> None:
    """Join a multi-host cluster (call BEFORE any device use).

    Thin wrapper over ``jax.distributed.initialize`` so entry points don't
    import jax internals; works for real multi-host TPU pods and for
    multi-process CPU tests alike.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def data_axes(mesh: Mesh):
    """All mesh axis names, as the batch-sharding spec: data parallelism
    uses every axis ('data' on a flat mesh, ('dcn', 'ici') on a hybrid)."""
    return tuple(mesh.axis_names)


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Shard leading (batch) dim over ``axis`` (default: all mesh axes),
    replicate the rest."""
    return NamedSharding(mesh, P(axis if axis is not None
                                 else data_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh, axis=None):
    """Make every leaf a (global) device array with the leading dim sharded.

    Single-process: a plain ``device_put``. Multi-process: each host passes
    its LOCAL slice of the batch (global batch = concat of host slices in
    process order) and gets back a global array — the host-side half of the
    legacy per-GPU input queues (protobuf_db.py:299-358).
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def host_shard_indices(n_items: int) -> slice:
    """This host's strided share of a dataset index space (per-host manifest
    sharding: host i reads windows i, i+P, i+2P, ...).

    Every host gets exactly ``n_items // P`` windows — the remainder is
    dropped. Unequal shards would give hosts different steps_per_epoch and
    deadlock the first collective the shorter host never joins.
    """
    p = max(jax.process_count(), 1)
    per_host = n_items // p
    i = jax.process_index()
    return slice(i, i + per_host * p, p)

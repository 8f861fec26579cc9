"""Sharded multi-stream inference over a device mesh.

TPU-native replacement for the legacy tower-replicated evaluator
(.legacy/multi_gpu_pipeline/feedforward_pipeline.py:258-320): N independent
video streams are batch-sharded over the mesh, each device owning
``N / n_devices`` of them. The streaming step has no cross-batch terms, so
XLA inserts no collectives — per-device latency stays at the single-stream
step cost while aggregate throughput scales linearly with the mesh (the
right way to scale serving on TPU; growing the per-chip batch instead
anti-scales the per-pixel DSCV fetch, see DEVELOPMENT.md).

Weights are replicated; the temporal state lives sharded on the devices and
never round-trips to the host. State buffers are donated: steady-state
serving allocates nothing.
"""

from __future__ import annotations

from typing import Optional

import jax

from m4depth_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
)


def jit_sharded_stream(model, mesh, axis=None, donate_state: bool = True):
    """Compile ``model.step`` with streams sharded over ``mesh``.

    Returns ``step(params, state, rgb, rot, trans, camera, new_traj) ->
    (state, depth)`` where every array's leading dim is the stream/batch
    axis, laid out with ``batch_sharding(mesh, axis)``; ``params`` are
    replicated. Use :func:`shard_stream_inputs` (or plain ``device_put``
    with the same sharding) for the per-frame host inputs.
    """
    bs = batch_sharding(mesh, axis)
    rep = replicated_sharding(mesh)
    step_method = type(model).step

    def fn(params, state, rgb, rot, trans, camera, new_traj):
        return model.apply(params, state, rgb, rot, trans, camera, new_traj,
                           method=step_method)

    return jax.jit(
        fn,
        in_shardings=(rep, bs, bs, bs, bs, bs, bs),
        out_shardings=(bs, bs),
        donate_argnums=(1,) if donate_state else (),
    )


def shard_stream_inputs(inputs, mesh, axis=None):
    """Place per-frame host inputs with the stream axis sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), inputs)


def replicate_params(params, mesh):
    """Place weights replicated on every mesh device."""
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)


def assert_collective_free(compiled) -> None:
    """Serving steps must not communicate: raise if the compiled HLO
    contains any cross-device collective (diagnostic for mesh/sharding
    mistakes that silently serialize serving)."""
    txt = compiled.as_text()
    for marker in ("all-reduce", "all-gather", "collective-permute",
                   "reduce-scatter", "all-to-all"):
        if marker in txt:
            raise AssertionError(
                f"sharded stream step contains a {marker} collective")

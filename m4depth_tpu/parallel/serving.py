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


class FreshFrameStream:
    """Double-buffered fresh-frame streaming inference.

    The reference's online use case feeds one camera frame per python-loop
    iteration (main.py:163-172), serializing [h2d transfer, compute] every
    frame. This session pipelines them: ``push(frame_t)`` first issues frame
    t's host->device transfer, then dispatches the step for frame t-1 whose
    inputs already live on device — so frame t's transfer rides under frame
    t-1's compute (JAX dispatch is asynchronous; the DMA and the step overlap
    on the device). Steady-state per-frame cost is max(step, transfer)
    instead of their sum.

    ``push`` returns the depth for frame t-1 (None on the first call) as an
    asynchronous device array — materialize it with ``np.asarray`` only when
    needed. Call ``flush()`` after the last frame to drain the pipeline.

    Throughput expectation: on a normally host-attached TPU the steady state
    is max(step, transfer) — with the measured 3.0 ms frame DMA under the
    ~4.9 ms step, ~the device-resident streaming rate. That figure is a
    PROJECTION from those two measured components, not an end-to-end
    measurement: the only rig available here tunnels the TPU and drains the
    dispatch pipeline on every h2d transfer, so overlap cannot be
    demonstrated (10-22 fps transport-bound, DEVELOPMENT.md "Fresh-frame
    serving through the tunnel").

    Works on one chip or over a mesh: pass ``sharding`` (e.g.
    ``batch_sharding(mesh)``) to place multi-stream inputs; omit it for
    single-device placement.
    """

    def __init__(self, model, params, state, *, sharding=None,
                 donate_state: bool = True):
        step_method = type(model).step

        def fn(params, state, rgb, rot, trans, camera, new_traj):
            return model.apply(params, state, rgb, rot, trans, camera,
                               new_traj, method=step_method)

        self._step = jax.jit(
            fn, donate_argnums=(1,) if donate_state else ())
        self._where = sharding if sharding is not None else jax.devices()[0]
        self._params = params
        self._state = state
        self._staged = None

    def push(self, rgb, rot, trans, camera, new_traj):
        """Stage frame t (async transfer) and dispatch frame t-1's step.

        Returns frame t-1's depth (async), or None on the first call.
        """
        staged = jax.device_put((rgb, rot, trans, camera, new_traj),
                                self._where)
        depth = None
        if self._staged is not None:
            self._state, depth = self._step(self._params, self._state,
                                            *self._staged)
        self._staged = staged
        return depth

    def flush(self):
        """Run the step for the last staged frame; returns its depth."""
        if self._staged is None:
            return None
        self._state, depth = self._step(self._params, self._state,
                                        *self._staged)
        self._staged = None
        return depth

    @property
    def state(self):
        """Current temporal state (frames pushed but not yet stepped are
        not reflected until the next push/flush)."""
        return self._state


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

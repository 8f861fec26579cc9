"""Jitted train/eval step factories.

Replaces the reference's Keras ``train_step``/``test_step`` overrides
(m4depth_network.py:371-474) with pure functions over an explicit
``TrainState``; data parallelism is expressed through shardings on a
``Mesh`` (gradient psums are inserted by XLA — the TPU-native equivalent of
the legacy NCCL towers, .legacy/multi_gpu_pipeline/feedforward_pipeline.py).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState
from jax.sharding import Mesh

from m4depth_tpu.geometry import Camera
from m4depth_tpu.metrics import MetricAccumulator, clip_for_eval, compute_metrics
from m4depth_tpu.models import M4Depth
from m4depth_tpu.parallel.mesh import batch_sharding, replicated_sharding

# Training batch pytree:
#   rgb      [b, T, h, w, 3] float32 in [0, 1]
#   depth    [b, T, h, w, 1] float32 (0 = hole for velodyne gt)
#   rot      [b, T, 4] (w,x,y,z) frame-to-frame quaternion
#   trans    [b, T, 3] frame-to-frame translation (camera axes)
#   camera_f [b, 2], camera_c [b, 2] intrinsics
Batch = Dict[str, jnp.ndarray]


def batch_camera(batch: Batch) -> Camera:
    return Camera(f=batch["camera_f"], c=batch["camera_c"])


def _rmse_log(gt: jnp.ndarray, est: jnp.ndarray) -> jnp.ndarray:
    """Train-time monitoring metric (main.py:94 compiles RMSE_log only)."""
    gt_c, est_c = clip_for_eval(gt, est)
    return compute_metrics(gt_c, est_c)["RMSE_log"]


def _summary_images(batch: Batch, preds, camera: Camera) -> Dict[str, jnp.ndarray]:
    """Image summaries from tensors already computed by the train forward:
    input frame, reprojection sanity check, gt and per-level predicted
    log-depth (parity: the in-graph image summaries of the reference train
    step, m4depth_network.py:401-415)."""
    from m4depth_tpu.geometry import reproject

    max_d = 200.0
    gt = batch["depth"][:, -1]
    reproj, _ = reproject(batch["rgb"][:, -2], gt, batch["rot"][:, -1],
                          batch["trans"][:, -1], camera)
    log_norm = lambda x: (  # noqa: E731
        jnp.log(jnp.clip(x, 1.0, max_d)) / jnp.log(max_d))
    images = {
        "RGB_im": batch["rgb"][0, -1],
        "camera_prev_t_reproj": reproj[0],
        "depth_gt": log_norm(gt[0]),
    }
    for i, est in enumerate(preds[-1]):
        images[f"depth_lvl_{i}"] = log_norm(est.depth[0])
    return images


def make_train_step(
    model: M4Depth,
    with_images: bool = False,
    augment_fn: Callable[[Batch, jax.Array], Batch] = None,
    augment_seed: int = 0,
) -> Callable[[TrainState, Batch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """One optimization step over a [b, T, ...] window.

    ``with_images=True`` adds an ``"images"`` entry to the aux dict, computed
    from the SAME forward pass (the reference emitted summaries from tensors
    already in the train step, m4depth_network.py:401-415 — no second apply).
    The tensors are tiny (first batch element only) and are only transferred
    to the host when the caller actually reads them on a log step.

    ``augment_fn``: optional jitted on-device augmentation (see
    data/augment_device.py) applied to the batch INSIDE the step — the
    TPU-native version of the reference's in-graph augmentations
    (dataloaders/generic.py:189-259). Keyed deterministically per step by
    folding ``state.step`` into ``augment_seed``.
    """

    def train_step(state: TrainState, batch: Batch):
        if augment_fn is not None:
            key = jax.random.fold_in(
                jax.random.PRNGKey(augment_seed), state.step)
            batch = augment_fn(batch, key)
        camera = batch_camera(batch)

        def loss_fn(params):
            preds = model.apply(params, batch["rgb"], batch["rot"],
                                batch["trans"], camera)
            return model.loss(batch["depth"], preds), preds

        (loss, preds), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads=grads)

        gt = batch["depth"][:, -1]
        est = model.final_depth(preds, gt.shape[1:3])
        scalars = {
            "loss": loss,
            "RMSE_log": _rmse_log(gt, est),
            "grad_norm": optax.global_norm(grads),
        }
        if with_images:
            scalars["images"] = _summary_images(batch, preds, camera)
        return new_state, scalars

    return train_step


def make_windowed_eval_step(model: M4Depth):
    """KITTI-protocol eval: run a [b, T, ...] window, score the LAST frame
    only at full resolution (m4depth_network.py:439-455)."""

    def eval_step(params, batch: Batch, acc: MetricAccumulator):
        camera = batch_camera(batch)
        preds = model.apply(params, batch["rgb"], batch["rot"],
                            batch["trans"], camera)
        gt = batch["depth"][:, -1]
        est = model.final_depth(preds, gt.shape[1:3])
        gt_c, est_c = clip_for_eval(gt, est)
        return acc.update(compute_metrics(gt_c, est_c))

    return eval_step


def make_streaming_eval_step(model: M4Depth):
    """Frame-at-a-time eval (Mid-Air / TartanAir protocol): temporal state is
    carried by the caller; frames flagged new_traj are scored with weight 0
    (m4depth_network.py:456-470)."""

    def eval_step(params, model_state, frame: Batch, acc: MetricAccumulator):
        camera = batch_camera(frame)
        new_traj = frame["new_traj"]
        model_state, est = model.apply(
            params, model_state, frame["rgb"], frame["rot"], frame["trans"],
            camera, new_traj, method=type(model).step)
        gt_c, est_c = clip_for_eval(frame["depth"], est)
        weight = 1.0 - jnp.max(new_traj.astype(jnp.float32))
        acc = acc.update(compute_metrics(gt_c, est_c), weight=weight)
        return model_state, acc

    return eval_step


def jit_data_parallel(step_fn, mesh: Mesh, donate_state: bool = True):
    """Jit a (state, batch) -> (state, aux) step with the batch sharded over
    the mesh ``data`` axis and the state replicated."""
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, data),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def make_lr_schedule(learning_rate: float, schedule: str = "constant",
                     total_steps: int = 0):
    """"constant" (main.py:92), "staircase" — halve at 60k/120k/180k/
    240k/300k steps (legacy parity, .legacy/m4depth_pipeline.py:192-196) —
    or "cosine" (200-step warmup, decay to 5% over ``total_steps``; the
    recipe VALIDATION.md's long synthetic runs converged best with).

    Always returns a callable so the Adam state structure (and therefore
    checkpoint restorability across processes with different flags — e.g.
    the validation subprocess) is schedule-independent.
    """
    if schedule == "staircase":
        return optax.piecewise_constant_schedule(
            learning_rate,
            {60_000: 0.5, 120_000: 0.5, 180_000: 0.5, 240_000: 0.5,
             300_000: 0.5})
    if schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps=200,
            decay_steps=max(total_steps, 1000),
            end_value=learning_rate * 0.05)
    if schedule != "constant":
        raise ValueError(f"unknown lr_schedule: {schedule!r}")
    return optax.constant_schedule(learning_rate)


def create_train_state(
    model: M4Depth,
    rng: jax.Array,
    sample_batch: Batch,
    learning_rate: float = 1e-4,
    lr_schedule: str = "constant",
    grad_clip_norm: float = 0.0,
    total_steps: int = 0,
) -> TrainState:
    """Initialize params (requires T >= 2 in the sample) + Adam optimizer.

    Parity: Adam(1e-4) (main.py:92). Optional global-norm gradient clipping
    (the reference had none and documents NaN crashes, README.md:153).

    The optimizer state STRUCTURE is identical for every (schedule, clip)
    combination — the clip slot is filled with ``optax.identity`` when off —
    so a checkpoint written under any flags restores in a process built with
    any others (the validation subprocess builds its restore target with
    defaults, cli/main.py:350-356).
    """
    params = jax.jit(model.init)(
        rng, sample_batch["rgb"], sample_batch["rot"],
        sample_batch["trans"], batch_camera(sample_batch))
    tx = optax.adam(
        make_lr_schedule(learning_rate, lr_schedule, total_steps))
    clip = (optax.clip_by_global_norm(grad_clip_norm)
            if grad_clip_norm > 0 else optax.identity())
    tx = optax.chain(clip, tx)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)

"""Training loop: epochs, NaN tripwire, checkpoints, validation, telemetry.

Parity reference:
  * Keras fit loop + callbacks (main.py:105-109, callbacks.py:69-170):
    restore-latest on start, per-epoch rolling checkpoints, refuse to save
    after a NaN stop, optional KITTI validation per epoch feeding the best-K
    manager.
  * Throughput telemetry (img/sec mean +/- stderr, MAD jitter) mirrors the
    legacy pipeline's reporting
    (.legacy/multi_gpu_pipeline/feedforward_pipeline.py:590-611).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from m4depth_tpu.config import TrainConfig
from m4depth_tpu.data.pipeline import SequenceDataset
from m4depth_tpu.models import M4Depth
from m4depth_tpu.parallel import make_mesh, shard_batch_pytree
from m4depth_tpu.train.checkpoints import (
    BestCheckpointManager,
    TrainCheckpointManager,
)
from m4depth_tpu.train.step import (
    create_train_state,
    jit_data_parallel,
    make_train_step,
)
from m4depth_tpu.utils.logging import MetricLogger


class ThroughputMeter:
    """img/sec statistics: mean +/- stderr and MAD jitter."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.times = []

    def tick(self, dt: float):
        self.times.append(dt)

    def report(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times[1:] or self.times)
        ips = self.batch_size / arr
        mad = float(np.median(np.abs(arr - np.median(arr))))
        return {
            "img_per_sec": float(ips.mean()),
            "img_per_sec_stderr": float(ips.std() / max(len(ips), 1) ** 0.5),
            "step_time_mad_jitter": mad,
        }

    def reset(self):
        self.times = []


class NaNStop(RuntimeError):
    pass


class OutOfMemory(RuntimeError):
    """Raised on device RESOURCE_EXHAUSTED so callers can exit cleanly
    (parity: the legacy pipeline's OOM catch -> exit code -2,
    .legacy/multi_gpu_pipeline/feedforward_pipeline.py:569-573,620-622)."""


def fit(
    model: M4Depth,
    dataset: SequenceDataset,
    cfg: TrainConfig,
    total_steps: Optional[int] = None,
    resume: bool = True,
    validation_fn: Optional[Callable[[object], Dict[str, float]]] = None,
    nan_check_every: int = 25,
    log_every: Optional[int] = None,
    augment_fn: Optional[Callable] = None,
) -> object:
    """Train to ``total_steps`` optimizer steps (sample-steps/len semantics of
    the reference: epochs = total_steps // len(dataset), main.py:105-107).

    Returns the final TrainState. Raises NaNStop on non-finite loss without
    saving the poisoned state (callbacks.py:92-95,121).
    """
    import os

    total_steps = total_steps or cfg.total_steps
    steps_per_epoch = len(dataset)
    if steps_per_epoch == 0:
        raise ValueError("dataset yields zero batches")
    n_epochs = max(total_steps // steps_per_epoch, 1)

    import itertools

    # peek the first batch for shapes, then continue the SAME generator for
    # epoch 0 (restarting it would decode the lookahead windows twice and
    # abandon a live worker pool)
    _epoch0_gen = dataset.batches(0)
    sample = next(_epoch0_gen)
    epoch0 = itertools.chain([sample], _epoch0_gen)
    batch_size = sample["rgb"].shape[0]  # per-host (local) batch
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    lr_schedule = getattr(cfg, "lr_schedule", "constant")
    n_proc = max(jax.process_count(), 1)
    global_batch = batch_size * n_proc  # hosts feed equal local slices
    if global_batch % mesh.devices.size != 0:
        if n_proc > 1:
            # a shrunken submesh cannot cover every host's addressable
            # devices; make_array_from_process_local_data would fail or
            # mis-shard — fail loudly instead
            raise ValueError(
                f"global batch {global_batch} ({batch_size}/host x "
                f"{n_proc} hosts) not divisible by {mesh.devices.size} "
                f"devices; choose a divisible per-host batch")
        # shrink the data axis to the largest divisor of the batch
        n = mesh.devices.size
        while global_batch % n != 0:
            n -= 1
        print(f"batch {global_batch} not divisible by {mesh.devices.size} "
              f"devices; using a {n}-device data mesh")
        # the fallback mesh is 1-D: keep only one axis name
        mesh = make_mesh((n,), cfg.mesh_axes[:1])
    logger = MetricLogger(cfg.log_dir)
    state = create_train_state(model, jax.random.PRNGKey(cfg.seed), sample,
                               learning_rate=cfg.learning_rate,
                               lr_schedule=lr_schedule,
                               grad_clip_norm=getattr(cfg, "grad_clip_norm",
                                                      0.0),
                               total_steps=total_steps)

    ckpt_dir = os.path.join(cfg.ckpt_dir, "train")
    ckpt_mgr = TrainCheckpointManager(ckpt_dir, max_keep=cfg.keep_last_n)
    start_epoch = 0
    if resume:
        start_epoch = ckpt_mgr.resume_epoch
        if start_epoch > 0:
            print(f"Resuming from epoch {start_epoch}")
            state = ckpt_mgr.restore_latest(state)
            _epoch0_gen.close()  # resume skips epoch 0: stop its workers

    best_mgr = None
    if validation_fn is not None:
        best_mgr = BestCheckpointManager(
            ckpt_dir, os.path.join(cfg.ckpt_dir, "best"),
            keep_top_n=cfg.keep_top_n)

    dp_step = jit_data_parallel(
        make_train_step(model, with_images=bool(cfg.log_dir),
                        augment_fn=augment_fn, augment_seed=cfg.seed), mesh)
    meter = ThroughputMeter(dataset.batch_size * (sample["rgb"].shape[1]))
    log_every = log_every or cfg.summary_interval

    step_idx = start_epoch * steps_per_epoch
    last_scalars = None

    # Lagged NaN tripwire: losses are checked ``nan_lag`` steps behind the
    # dispatch frontier, so the float() never stalls the device pipeline (the
    # value is already materialized) — round 1 forced a full host sync every
    # 25 steps here. NaN params poison every later loss, so a lagged check
    # still guarantees no poisoned checkpoint is ever saved.
    from collections import deque

    nan_lag = max(2, min(nan_check_every, 8))
    inflight = deque()

    def drain_nan_checks(upto_len: int):
        while len(inflight) > upto_len:
            s_i, l = inflight.popleft()
            lf = float(l)
            if not np.isfinite(lf):
                raise NaNStop(f"non-finite loss at step {s_i}: {lf}")

    try:
        for epoch in range(start_epoch, n_epochs):
            t_epoch = time.time()
            batches = (epoch0 if epoch == 0 and start_epoch == 0
                       else dataset.batches(epoch))
            for batch in batches:
                sharded = shard_batch_pytree(batch, mesh)
                t0 = time.time()
                state, scalars = dp_step(state, sharded)
                inflight.append((step_idx, scalars["loss"]))
                drain_nan_checks(nan_lag)
                meter.tick(time.time() - t0)
                last_scalars = scalars
                if step_idx % log_every == 0:
                    images = scalars.pop("images", None)
                    vals = {k: float(v) for k, v in scalars.items()}
                    vals.update(meter.report())
                    logger.log_scalars(step_idx, vals, prefix="train/")
                    print(f"epoch {epoch} step {step_idx}: " +
                          " ".join(f"{k}={v:.4g}" for k, v in vals.items()),
                          flush=True)
                    if images is not None:
                        logger.log_images(
                            step_idx,
                            {k: np.asarray(v) for k, v in images.items()})
                step_idx += 1

            # epoch end: drain the tripwire, then NaN-gate the save
            drain_nan_checks(0)
            if last_scalars is not None and \
                    not np.isfinite(float(last_scalars["loss"])):
                raise NaNStop(f"non-finite loss at end of epoch {epoch}")
            ckpt_mgr.save(epoch, state)
            print(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s; "
                  f"checkpoint saved", flush=True)

            if validation_fn is not None:
                perfs = validation_fn(state.params)
                if perfs is not None:  # None => async validation in flight
                    logger.log_scalars(step_idx, perfs, prefix="val/")
                    if best_mgr is not None:
                        best_mgr.update(epoch, perfs, state)
    except Exception as e:
        # surface device OOM distinctly (parity: legacy exit code -2).
        # Dispatch is async, so RESOURCE_EXHAUSTED can surface at any later
        # blocking host read (float(loss) in the tripwire, logging, the
        # checkpoint save) — catch it at the loop level, not per dispatch.
        if (not isinstance(e, (NaNStop, OutOfMemory))
                and "RESOURCE_EXHAUSTED" in str(e)):
            raise OutOfMemory(str(e)) from e
        raise
    finally:
        ckpt_mgr.close()
        logger.close()
        close = getattr(validation_fn, "close", None)
        if close is not None:  # reap any in-flight validation subprocess
            close()
    return state

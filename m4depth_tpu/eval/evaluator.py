"""Evaluation protocols.

Parity reference: ``test_step`` (m4depth_network.py:433-474) + eval wiring
(main.py:111-148):
  * Mid-Air / TartanAir: frame-at-a-time streaming, temporal state carried
    across calls, frames flagged new_traj are excluded from the metrics.
  * KITTI: 4-frame windows, only the LAST frame is scored (sparse gt with
    the Garg/Eigen crop applied by the dataloader).
Metrics are the 7-metric suite with clip-to-[0,80] protocol; results are
written to ``perfs-<dataset>.txt`` (main.py:147-148).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from m4depth_tpu.data.pipeline import SequenceDataset
from m4depth_tpu.metrics import METRIC_NAMES, MetricAccumulator
from m4depth_tpu.models import M4Depth, init_state
from m4depth_tpu.train.step import (
    make_streaming_eval_step,
    make_windowed_eval_step,
)


# jitted eval steps cached per model INSTANCE: per-epoch validation calls
# evaluate() repeatedly with the same model, and a fresh jax.jit(closure)
# each call keys the jit cache on a new function object — a full XLA
# retrace+compile of the eval graph every epoch. Keyed by id() with the
# model kept in the entry (strong ref pins the id; identity re-checked).
_STEP_CACHE: dict = {}


def _jitted_step(kind: str, model: M4Depth, make):
    key = (kind, id(model))
    ent = _STEP_CACHE.get(key)
    if ent is None or ent[0] is not model:
        ent = (model, jax.jit(make(model)))
        _STEP_CACHE[key] = ent
    return ent[1]


def evaluate_streaming(model: M4Depth, params, dataset: SequenceDataset,
                       progress_every: int = 0,
                       trace=None, max_steps: int = 0) -> Dict[str, float]:
    """Frame-at-a-time evaluation with O(1) device memory.

    ``max_steps`` > 0 bounds the number of frames scored (validation-time
    subset; 0 = the full set, the reference's only mode)."""
    step = _jitted_step("stream", model, make_streaming_eval_step)
    acc = MetricAccumulator.zeros()
    model_state = None
    n = 0
    for frame in dataset.frames():
        if model_state is None:
            b, h, w = frame["rgb"].shape[:3]
            model_state = init_state(model.cfg, b, h, w)
        if trace is not None:
            trace.on_step(n)
        batch = {k: jnp.asarray(v) for k, v in frame.items()}
        model_state, acc = step(params, model_state, batch, acc)
        n += 1
        if progress_every and n % progress_every == 0:
            print(f"  eval frame {n}", flush=True)
        if max_steps and n >= max_steps:
            break
    if trace is not None:
        trace.close()
    return {k: float(v) for k, v in acc.result().items()}


def evaluate_windowed(model: M4Depth, params, dataset: SequenceDataset,
                      progress_every: int = 0,
                      trace=None, max_steps: int = 0) -> Dict[str, float]:
    """Fixed-window evaluation scoring the last frame of each window."""
    step = _jitted_step("window", model, make_windowed_eval_step)
    acc = MetricAccumulator.zeros()
    n = 0
    for batch in dataset.batches():
        if trace is not None:
            trace.on_step(n)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        acc = step(params, jbatch, acc)
        n += 1
        if progress_every and n % progress_every == 0:
            print(f"  eval window {n}", flush=True)
        if max_steps and n >= max_steps:
            break
    if trace is not None:
        trace.close()
    return {k: float(v) for k, v in acc.result().items()}


def evaluate(model: M4Depth, params, dataset: SequenceDataset,
             progress_every: int = 0, trace=None,
             max_steps: int = 0) -> Dict[str, float]:
    """Dispatch on the dataset protocol (windowed iff db_seq_len set).

    ``trace``: optional ``utils.profiling.TraceWindow`` — the reference's
    ``profile_batch='10, 25'`` eval profiling (main.py:122).
    """
    if dataset.db_seq_len is not None:
        return evaluate_windowed(model, params, dataset, progress_every,
                                 trace, max_steps)
    return evaluate_streaming(model, params, dataset, progress_every, trace,
                              max_steps)


def write_perfs(metrics: Dict[str, float], ckpt_dir: str,
                dataset_name: str) -> str:
    """perfs-<dataset>.txt, one metric per line (main.py:147-148)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"perfs-{dataset_name}.txt")
    values = [metrics[name] for name in METRIC_NAMES]
    np.savetxt(path, np.asarray(values), fmt="%.18e", delimiter="\t")
    return path


def metrics_to_validation_perfs(metrics: Dict[str, float]) -> Dict[str, list]:
    """Map metric names to the best-checkpoint ledger keys
    (main.py:138-139)."""
    return {
        "abs_rel": metrics["AbsRel"],
        "sq_rel": metrics["SqRel"],
        "rmse": metrics["RMSE"],
        "rmsel": metrics["RMSE_log"],
        "a1": metrics["Delta1"],
        "a2": metrics["Delta2"],
        "a3": metrics["Delta3"],
    }

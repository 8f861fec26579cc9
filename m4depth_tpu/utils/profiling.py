"""Profiling and timing harness.

Parity reference: the TensorBoard profiling hooks of the reference
(``ProfilePredictCallback`` callbacks.py:24-67, ``profile_batch='10, 25'``
main.py:122) and the legacy chrome-trace/timeline machinery
(.legacy/multi_gpu_pipeline/feedforward_pipeline.py:414-415,539-548).

TPU-native: ``jax.profiler.trace`` captures XLA device traces viewable in
TensorBoard/XProf; ``Stopwatch``/``benchmark_fn`` give block-until-ready
wall-clock numbers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Trace device execution into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class TraceWindow:
    """Start/stop a profiler trace over a step-index window — the
    ``profile_batch='10, 25'`` pattern."""

    def __init__(self, log_dir: Optional[str], start_step: int, stop_step: int):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = stop_step
        self._active = False

    def on_step(self, step: int) -> None:
        if not self.log_dir:
            return
        if step == self.start_step and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def benchmark_fn(fn: Callable, *args, warmup: int = 3, iters: int = 30,
                 **kwargs) -> Dict[str, float]:
    """Wall-clock statistics of a jitted callable (mean/p50/MAD jitter).

    Completion is forced with a host transfer of one output leaf —
    ``block_until_ready`` alone can return early through the tunneled-TPU
    transport (DEVELOPMENT.md), yielding wildly optimistic numbers.
    """

    def force(o):
        leaves = jax.tree_util.tree_leaves(o)
        if leaves:
            np.asarray(leaves[0])

    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    force(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        force(out)
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "mean_s": float(arr.mean()),
        "p50_s": float(np.median(arr)),
        "mad_jitter_s": float(np.median(np.abs(arr - np.median(arr)))),
        "stderr_s": float(arr.std() / len(arr) ** 0.5),
    }


def compiled_cost(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis (FLOPs / bytes) of a jitted function — the static
    counterpart of a device trace."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return {k: float(v) for k, v in analysis.items()
                if isinstance(v, (int, float))}
    except Exception:
        return {}

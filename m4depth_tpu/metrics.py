"""Depth evaluation metrics with running-mean accumulation.

Parity reference: metrics.py:3-64 — seven masked metrics (AbsRel, SqRel,
RMSE, RMSE_log, delta<1.25^{1,2,3}), each computed as one scalar per batch
(mask gt > 1e-6) and averaged uniformly across update steps (Keras Mean
semantics). The eval protocol clips gt to [0, 80] and estimates to
[0.001, 80] before scoring (m4depth_network.py:465-467).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

METRIC_NAMES = ("AbsRel", "SqRel", "RMSE", "RMSE_log", "Delta1", "Delta2", "Delta3")


def _masked_mean(err: jnp.ndarray, gate: jnp.ndarray) -> jnp.ndarray:
    mask = (gate > 1e-6).astype(jnp.float32)
    # multiply_no_nan semantics: a masked-off entry contributes 0 even if err
    # is non-finite there (metrics.py:5)
    prod = jnp.where(mask > 0, err * mask, 0.0)
    return jnp.sum(prod) / jnp.maximum(jnp.sum(mask), 1.0)


def compute_metrics(gt: jnp.ndarray, est: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Seven scalar metrics for one batch. gt == 0 pixels are masked out."""
    gt = gt.astype(jnp.float32)
    est = est.astype(jnp.float32)
    out = {}
    out["AbsRel"] = _masked_mean(jnp.abs(gt - est) / (gt + 1e-6), gt)
    out["SqRel"] = _masked_mean(jnp.square(gt - est) / (gt + 1e-6), gt)
    out["RMSE"] = jnp.sqrt(_masked_mean(jnp.square(gt - est), gt))
    # RMSE_log gates on the *logged* gt (> 1e-6 <=> gt > ~1 m) — a reference
    # quirk kept for parity (metrics.py:24-28).
    lt, lp = jnp.log(gt + 1e-6), jnp.log(est + 1e-6)
    out["RMSE_log"] = jnp.sqrt(_masked_mean(jnp.square(lt - lp), lt))
    thresh = jnp.maximum(gt / jnp.maximum(est, 1e-12),
                         est / jnp.maximum(gt, 1e-12))
    for k in (1, 2, 3):
        out[f"Delta{k}"] = _masked_mean(
            (thresh < 1.25 ** k).astype(jnp.float32), gt)
    return out


def clip_for_eval(gt: jnp.ndarray, est: jnp.ndarray, max_depth: float = 80.0):
    """Eval protocol clipping (m4depth_network.py:465-467)."""
    return jnp.clip(gt, 0.0, max_depth), jnp.clip(est, 0.001, max_depth)


class MetricAccumulator(NamedTuple):
    """Uniform-over-steps running means (Keras ``metrics.Mean`` semantics).

    A jit-friendly pytree: totals/count are arrays, update returns a new
    accumulator. ``weight`` lets a step be skipped (new_traj frames in
    streaming eval, m4depth_network.py:469-470).
    """

    totals: jnp.ndarray  # [7]
    count: jnp.ndarray   # []

    @classmethod
    def zeros(cls) -> "MetricAccumulator":
        return cls(totals=jnp.zeros((len(METRIC_NAMES),), jnp.float32),
                   count=jnp.zeros((), jnp.float32))

    def update(self, metrics: Dict[str, jnp.ndarray],
               weight: jnp.ndarray | float = 1.0) -> "MetricAccumulator":
        vec = jnp.stack([metrics[name] for name in METRIC_NAMES])
        w = jnp.asarray(weight, jnp.float32)
        # a skipped frame (weight 0 — e.g. new_traj in streaming eval) must
        # contribute NOTHING even if its metrics are non-finite: NaN * 0 is
        # NaN and would poison the running totals for good
        vec = jnp.where(w > 0, vec * w, 0.0)
        return MetricAccumulator(totals=self.totals + vec,
                                 count=self.count + w)

    def result(self) -> Dict[str, jnp.ndarray]:
        means = self.totals / jnp.maximum(self.count, 1.0)
        return {name: means[i] for i, name in enumerate(METRIC_NAMES)}

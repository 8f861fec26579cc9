"""Tests for the sequence loss and evaluation metrics."""

import numpy as np
import jax.numpy as jnp

from m4depth_tpu.losses import m4depth_loss
from m4depth_tpu.metrics import (
    MetricAccumulator,
    clip_for_eval,
    compute_metrics,
)
from m4depth_tpu.models.decoder import LevelEstimate


def make_pred(depth):
    d = jnp.asarray(depth)
    return LevelEstimate(depth=d, parallax=jnp.ones_like(d),
                         other=jnp.zeros(d.shape[:3] + (4,), jnp.float32))


class TestLoss:
    def test_perfect_prediction_zero_loss(self):
        gt = jnp.full((1, 2, 8, 8, 1), 10.0, jnp.float32)
        preds = [
            [make_pred(jnp.full((1, 4, 4, 1), 10.0))],
            [make_pred(jnp.full((1, 4, 4, 1), 10.0))],
        ]
        loss = float(m4depth_loss(gt, preds))
        np.testing.assert_allclose(loss, 0.0, atol=1e-6)

    def test_frame0_excluded(self):
        gt = jnp.full((1, 2, 8, 8, 1), 10.0, jnp.float32)
        preds = [
            [make_pred(jnp.full((1, 4, 4, 1), 999.0))],  # frame 0: ignored
            [make_pred(jnp.full((1, 4, 4, 1), 10.0))],
        ]
        np.testing.assert_allclose(float(m4depth_loss(gt, preds)), 0.0, atol=1e-6)

    def test_pyramid_weights(self):
        # constant offset in log space: |log(gt) - log(pred)| = log(2)
        gt = jnp.full((1, 2, 8, 8, 1), 10.0, jnp.float32)
        preds = [
            [make_pred(jnp.full((1, 8, 8, 1), 10.0)),
             make_pred(jnp.full((1, 4, 4, 1), 10.0))],
            [make_pred(jnp.full((1, 8, 8, 1), 20.0)),
             make_pred(jnp.full((1, 4, 4, 1), 20.0))],
        ]
        loss = float(m4depth_loss(gt, preds))
        expected = (0.64 * 2 + 0.64) * np.log(2.0)  # i=0 weight 1.28, i=1 0.64
        np.testing.assert_allclose(loss, expected, rtol=1e-5)

    def test_velodyne_ignores_holes(self):
        # gt sparse: only one valid pixel per 2x2 block in half the blocks
        gt = np.zeros((1, 2, 8, 8, 1), np.float32)
        gt[0, 1, ::2, ::2, 0] = 10.0  # valid points
        preds = [
            [make_pred(jnp.full((1, 4, 4, 1), 10.0))],
            [make_pred(jnp.full((1, 4, 4, 1), 10.0))],
        ]
        loss = float(m4depth_loss(jnp.asarray(gt), preds, depth_type="velodyne"))
        np.testing.assert_allclose(loss, 0.0, atol=1e-6)

        preds_bad = [
            [make_pred(jnp.full((1, 4, 4, 1), 10.0))],
            [make_pred(jnp.full((1, 4, 4, 1), 20.0))],
        ]
        loss_bad = float(
            m4depth_loss(jnp.asarray(gt), preds_bad, depth_type="velodyne"))
        np.testing.assert_allclose(loss_bad, 1.28 * np.log(2.0), rtol=1e-4)


class TestMetrics:
    def test_perfect(self):
        gt = jnp.full((1, 4, 4, 1), 10.0, jnp.float32)
        m = compute_metrics(gt, gt)
        np.testing.assert_allclose(float(m["AbsRel"]), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(m["RMSE"]), 0.0, atol=1e-4)
        np.testing.assert_allclose(float(m["Delta1"]), 1.0)

    def test_numpy_oracle(self):
        rng = np.random.RandomState(0)
        gt = rng.uniform(0.0, 60.0, (2, 8, 8, 1)).astype(np.float32)
        gt[gt < 5] = 0.0  # holes
        est = rng.uniform(1.0, 60.0, (2, 8, 8, 1)).astype(np.float32)
        m = compute_metrics(jnp.asarray(gt), jnp.asarray(est))

        mask = gt > 1e-6
        n = mask.sum()
        abs_rel = (np.abs(gt - est) / (gt + 1e-6))[mask].sum() / n
        sq_rel = (np.square(gt - est) / (gt + 1e-6))[mask].sum() / n
        rmse = np.sqrt(np.square(gt - est)[mask].sum() / n)
        thresh = np.maximum(gt / est, est / np.maximum(gt, 1e-12))
        d1 = ((thresh < 1.25) & mask).sum() / n
        np.testing.assert_allclose(float(m["AbsRel"]), abs_rel, rtol=1e-5)
        np.testing.assert_allclose(float(m["SqRel"]), sq_rel, rtol=1e-5)
        np.testing.assert_allclose(float(m["RMSE"]), rmse, rtol=1e-5)
        np.testing.assert_allclose(float(m["Delta1"]), d1, rtol=1e-5)

    def test_clip_for_eval(self):
        gt = jnp.array([[0.0, 100.0]], jnp.float32)
        est = jnp.array([[0.0, 100.0]], jnp.float32)
        g, e = clip_for_eval(gt, est)
        np.testing.assert_allclose(np.array(g), [[0.0, 80.0]])
        np.testing.assert_allclose(np.array(e), [[0.001, 80.0]])

    def test_accumulator_weighted_skip(self):
        acc = MetricAccumulator.zeros()
        gt = jnp.full((1, 4, 4, 1), 10.0, jnp.float32)
        m_good = compute_metrics(gt, gt)
        m_bad = compute_metrics(gt, gt * 3)
        acc = acc.update(m_good, weight=1.0)
        acc = acc.update(m_bad, weight=0.0)  # skipped (new_traj frame)
        res = acc.result()
        np.testing.assert_allclose(float(res["AbsRel"]), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(res["Delta1"]), 1.0)
        # uniform-over-steps mean, not pixel-weighted
        acc = acc.update(m_bad, weight=1.0)
        res = acc.result()
        np.testing.assert_allclose(float(res["AbsRel"]), 1.0, atol=1e-5)

    def test_accumulator_skipped_nan_does_not_poison(self):
        """A weight-0 (skipped) frame with non-finite metrics must contribute
        nothing: an untrained net can emit NaN estimates on a new_traj frame,
        and NaN * 0 would have poisoned the running totals for good (found
        live by the rehearsal's subprocess validation — AbsRel came back NaN
        while the Deltas, whose comparisons squash NaN, stayed finite)."""
        acc = MetricAccumulator.zeros()
        gt = jnp.full((1, 4, 4, 1), 10.0, jnp.float32)
        m_good = compute_metrics(gt, gt)
        m_nan = {k: jnp.asarray(float("nan")) for k in m_good}
        acc = acc.update(m_nan, weight=0.0)   # skipped new_traj frame
        acc = acc.update(m_good, weight=1.0)
        res = acc.result()
        assert np.isfinite(float(res["AbsRel"]))
        np.testing.assert_allclose(float(res["AbsRel"]), 0.0, atol=1e-6)

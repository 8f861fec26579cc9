"""Tests for the legacy (V1) model family."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from m4depth_tpu.config import ModelConfig
from m4depth_tpu.geometry import Camera
from m4depth_tpu.models import init_state
from m4depth_tpu.models.m4depth_v1 import (
    M4DepthV1,
    inverse_leaky_relu,
    m4depth_v1_loss,
)


def tiny_cfg():
    return ModelConfig(
        num_levels=2,
        encoder_channels=(8, 12),
        search_range=2,
    )


def make_inputs(rng, b=1, T=3, h=16, w=16):
    rgb = jnp.asarray(rng.rand(b, T, h, w, 3).astype(np.float32))
    # V1 uses small-angle 3-vector rotations
    rot = jnp.asarray(
        np.tile(np.array([0.002, -0.001, 0.003], np.float32), (b, T, 1)))
    trans = jnp.asarray(
        np.tile(np.array([0.05, 0.02, 0.4], np.float32), (b, T, 1)))
    camera = Camera(f=jnp.full((b, 2), w / 2.0),
                    c=jnp.full((b, 2), w / 2.0))
    return rgb, rot, trans, camera


class TestV1:
    def test_inverse_leaky(self):
        x = jnp.array([-1.0, 0.5])
        from m4depth_tpu.models.encoder import leaky_relu

        np.testing.assert_allclose(
            np.array(inverse_leaky_relu(leaky_relu(x, 0.1), 0.1)),
            np.array(x), rtol=1e-6)

    def test_window_shapes_and_finite(self):
        rng = np.random.RandomState(0)
        cfg = tiny_cfg()
        model = M4DepthV1(cfg)
        rgb, rot, trans, cam = make_inputs(rng)
        params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)
        preds = model.apply(params, rgb, rot, trans, cam)
        assert len(preds) == 3 and len(preds[0]) == 2
        assert preds[1][0].shape == (1, 8, 8, 1)
        assert preds[1][1].shape == (1, 4, 4, 1)
        for t in range(3):
            for lv in range(2):
                d = np.array(preds[t][lv])
                assert np.all(np.isfinite(d)) and np.all(d > 0)

    def test_streaming_matches_window(self):
        rng = np.random.RandomState(1)
        cfg = tiny_cfg()
        model = M4DepthV1(cfg)
        rgb, rot, trans, cam = make_inputs(rng, T=3)
        params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)
        preds = model.apply(params, rgb, rot, trans, cam)

        state = init_state(cfg, 1, 16, 16)
        for t in range(3):
            new_traj = jnp.array([t == 0])
            state, depth = model.apply(
                params, state, rgb[:, t], rot[:, t], trans[:, t], cam,
                new_traj, method=M4DepthV1.step)
        from m4depth_tpu.geometry import resize_nearest

        expected = resize_nearest(preds[2][0], (16, 16))
        np.testing.assert_allclose(np.array(depth), np.array(expected),
                                   rtol=1e-4, atol=1e-4)

    def test_single_frame_mode(self):
        rng = np.random.RandomState(2)
        cfg = tiny_cfg()
        model = M4DepthV1(cfg, single_frame=True)
        rgb, rot, trans, cam = make_inputs(rng, T=2)
        params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)
        preds = model.apply(params, rgb, rot, trans, cam)
        # no temporal dependence: identical frames give identical outputs
        rgb_same = jnp.concatenate([rgb[:, :1]] * 2, axis=1)
        preds_same = model.apply(params, rgb_same, rot, trans, cam)
        np.testing.assert_allclose(np.array(preds_same[0][0]),
                                   np.array(preds_same[1][0]), rtol=1e-4)

    def test_depth_recurrence_matches_legacy_row(self):
        """The V1 temporal-memory rotation compensation uses the LEGACY
        transposed small-angle row [ry, -rx, 1] with -t
        (.legacy/m4depth_model.py:54-82), not the current generation's
        [-ry, rx, 1]. The model passes -rot to recompute_depth; pin that
        composition against a numpy oracle of the legacy formula."""
        from m4depth_tpu.geometry import recompute_depth

        rng = np.random.RandomState(11)
        b, h, w = 2, 8, 8
        depth = rng.uniform(5, 50, (b, h, w, 1)).astype(np.float32)
        rot = np.array([[0.02, -0.03, 0.01], [-0.01, 0.04, -0.02]],
                       np.float32)
        trans = np.array([[0.1, -0.2, 0.5], [-0.3, 0.1, 0.4]], np.float32)
        f = np.full((b, 2), w / 2.0, np.float32)
        c = np.full((b, 2), w / 2.0, np.float32)
        cam = Camera(f=jnp.asarray(f), c=jnp.asarray(c))

        # legacy oracle: new_z = (ry*x/f - rx*y/f + 1)*z + (-ry*tx + rx*ty - tz)
        gx, gy = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
        expect = np.empty_like(depth)
        for i in range(b):
            xn = (gx - c[i, 0]) / f[i, 0]
            yn = (gy - c[i, 1]) / f[i, 1]
            rx, ry, _ = rot[i]
            scale = ry * xn - rx * yn + 1.0
            shift = -ry * trans[i, 0] + rx * trans[i, 1] - trans[i, 2]
            expect[i, :, :, 0] = np.clip(
                scale * depth[i, :, :, 0] + shift, 0.1, 2000.0)

        got = np.asarray(recompute_depth(jnp.asarray(depth),
                                         jnp.asarray(-rot),
                                         jnp.asarray(trans), cam))
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)

    def test_single_frame_loss_skips_last_frame(self):
        """Legacy 'special case 1' scores frames 0..T-2 only and divides by
        max(1, T-1) (m4depth_pipeline.py:111,129) — the last frame's
        prediction must not contribute."""
        b, T, h, w = 1, 3, 4, 4
        gt = jnp.full((b, T, h, w, 1), 10.0)
        good = jnp.full((b, h, w, 1), 10.0)   # zero log-L1 vs gt
        bad = jnp.full((b, h, w, 1), 100.0)   # would add if scored
        preds_clean = [[good] for _ in range(T)]
        preds_poison_last = [[good], [good], [bad]]
        l_clean = float(m4depth_v1_loss(gt, preds_clean, single_frame=True))
        l_poison = float(m4depth_v1_loss(gt, preds_poison_last,
                                         single_frame=True))
        assert l_clean == pytest.approx(0.0, abs=1e-6)
        assert l_poison == pytest.approx(l_clean, abs=1e-6)
        # ...but poisoning a SCORED frame moves the loss, / (T-1)
        preds_poison_mid = [[good], [bad], [good]]
        l_mid = float(m4depth_v1_loss(gt, preds_poison_mid,
                                      single_frame=True))
        expect = (0.64 / 2.0 ** (-1)) * abs(
            np.log(100.0) - np.log(10.0)) / (T - 1)
        assert l_mid == pytest.approx(expect, rel=1e-5)

    @pytest.mark.slow
    def test_loss_decreases(self):
        rng = np.random.RandomState(3)
        cfg = tiny_cfg()
        model = M4DepthV1(cfg)
        rgb, rot, trans, cam = make_inputs(rng, T=2)
        gt = jnp.asarray(rng.uniform(5, 50, (1, 2, 16, 16, 1)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                preds = model.apply(p, rgb, rot, trans, cam)
                return m4depth_v1_loss(gt, preds)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state2, loss

        losses = []
        for _ in range(25):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.8, losses

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

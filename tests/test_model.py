"""Model-level tests: shapes, streaming/windowed parity, per-element resets,
and a short overfit run (loss must decrease)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from m4depth_tpu.config import AblationFlags, ModelConfig
from m4depth_tpu.geometry import Camera
from m4depth_tpu.losses import m4depth_loss
from m4depth_tpu.models import M4Depth, init_state


def tiny_cfg(**kw):
    return ModelConfig(
        num_levels=3,
        encoder_channels=(8, 12, 16),
        refiner_prep_channels=(16, 16, 8),
        refiner_est_channels=(8, 8, 5),
        **kw,
    )


def make_inputs(rng, b=2, T=3, h=32, w=32):
    rgb = jnp.asarray(rng.rand(b, T, h, w, 3).astype(np.float32))
    rot = np.tile(np.array([1.0, 0.001, -0.002, 0.001], np.float32), (b, T, 1))
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    trans = np.tile(np.array([0.05, 0.02, 0.4], np.float32), (b, T, 1))
    camera = Camera(
        f=jnp.full((b, 2), float(w) / 2, jnp.float32),
        c=jnp.full((b, 2), float(w) / 2, jnp.float32),
    )
    return rgb, jnp.asarray(rot), jnp.asarray(trans), camera


class TestForward:
    def test_window_shapes(self):
        rng = np.random.RandomState(0)
        cfg = tiny_cfg()
        model = M4Depth(cfg)
        rgb, rot, trans, cam = make_inputs(rng)
        params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)
        preds = model.apply(params, rgb, rot, trans, cam)
        assert len(preds) == 3           # frames
        assert len(preds[0]) == 3        # levels, finest first
        assert preds[0][0].depth.shape == (2, 16, 16, 1)
        assert preds[0][2].depth.shape == (2, 4, 4, 1)
        assert preds[1][0].parallax.shape == (2, 16, 16, 1)
        assert preds[1][0].other.shape == (2, 16, 16, 4)
        for t in range(3):
            for lv in range(3):
                assert np.all(np.isfinite(np.array(preds[t][lv].depth)))

    def test_scan_matches_unroll(self):
        """The lax.scan time axis is numerically the python loop (fp32 CVs;
        bf16 differs only by fusion-order rounding)."""
        import dataclasses

        rng = np.random.RandomState(5)
        cfg_u = tiny_cfg(cv_dtype="float32", time_axis="unroll")
        cfg_s = dataclasses.replace(cfg_u, time_axis="scan")
        rgb, rot, trans, cam = make_inputs(rng, T=4)
        mu, ms = M4Depth(cfg_u), M4Depth(cfg_s)
        params = mu.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)
        pu = mu.apply(params, rgb, rot, trans, cam)
        ps = ms.apply(params, rgb, rot, trans, cam)
        for t in range(4):
            for lv in range(3):
                np.testing.assert_allclose(
                    np.asarray(ps[t][lv].depth), np.asarray(pu[t][lv].depth),
                    rtol=1e-4, atol=1e-4,
                    err_msg=f"scan/unroll diverge at frame {t} level {lv}")

    def test_scan_long_window_shapes(self):
        """T=8 (the reference's db_seq_len) traces one scan body, not 8."""
        rng = np.random.RandomState(6)
        model = M4Depth(tiny_cfg())
        rgb, rot, trans, cam = make_inputs(rng, T=8)
        params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)
        preds = jax.jit(model.apply)(params, rgb, rot, trans, cam)
        assert len(preds) == 8
        assert preds[7][0].depth.shape == (2, 16, 16, 1)
        assert np.all(np.isfinite(np.asarray(preds[7][0].depth)))

    def test_first_frame_outputs_init_depth(self):
        rng = np.random.RandomState(1)
        cfg = tiny_cfg()
        model = M4Depth(cfg)
        rgb, rot, trans, cam = make_inputs(rng)
        params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)
        preds = model.apply(params, rgb, rot, trans, cam)
        # frame 0 has no temporal context: cascaded init depth = 1000
        np.testing.assert_allclose(np.array(preds[0][0].depth), 1000.0, rtol=1e-4)

    def test_streaming_matches_window(self):
        # fp32 cost volumes: isolates the semantic invariant from bf16
        # fusion-order rounding, which legitimately differs between the
        # scanned window graph and the per-frame streaming graph
        rng = np.random.RandomState(2)
        cfg = tiny_cfg(cv_dtype="float32")
        model = M4Depth(cfg)
        rgb, rot, trans, cam = make_inputs(rng, b=2, T=3)
        params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)
        preds = model.apply(params, rgb, rot, trans, cam)

        b, h, w = 2, 32, 32
        state = init_state(cfg, b, h, w)
        depths = []
        for t in range(3):
            new_traj = jnp.full((b,), t == 0)
            state, depth = model.apply(
                params, state, rgb[:, t], rot[:, t], trans[:, t], cam,
                new_traj, method=M4Depth.step)
            depths.append(depth)

        # streaming full-res output is the nearest-upsampled finest level
        from m4depth_tpu.geometry import resize_nearest
        for t in range(3):
            expected = resize_nearest(preds[t][0].depth, (h, w))
            np.testing.assert_allclose(
                np.array(depths[t]), np.array(expected), rtol=1e-4, atol=1e-4)

    def test_per_element_reset(self):
        """Resetting one batch element mid-stream must equal running that
        element's frames as a fresh sequence (the reference can't do this —
        its reset is batch-global, m4depth_network.py:206-208)."""
        rng = np.random.RandomState(3)
        cfg = tiny_cfg()
        model = M4Depth(cfg)
        rgb, rot, trans, cam = make_inputs(rng, b=2, T=3)
        params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)

        b, h, w = 2, 32, 32
        # stream A: element 1 resets at t=1
        state = init_state(cfg, b, h, w)
        outs = []
        for t in range(3):
            new_traj = jnp.array([t == 0, t in (0, 1)])
            state, depth = model.apply(
                params, state, rgb[:, t], rot[:, t], trans[:, t], cam,
                new_traj, method=M4Depth.step)
            outs.append(np.array(depth))

        # stream B: element 1 alone, frames 1..2 as a fresh trajectory
        cam1 = Camera(f=cam.f[1:], c=cam.c[1:])
        state1 = init_state(cfg, 1, h, w)
        for i, t in enumerate([1, 2]):
            new_traj = jnp.array([i == 0])
            state1, depth1 = model.apply(
                params, state1, rgb[1:, t], rot[1:, t], trans[1:, t], cam1,
                new_traj, method=M4Depth.step)
        np.testing.assert_allclose(outs[2][1], np.array(depth1)[0],
                                   rtol=1e-4, atol=1e-4)

    def test_ablation_flags_change_graph(self):
        rng = np.random.RandomState(4)
        for flags in [
            AblationFlags(sncv=False),
            AblationFlags(dinl=False),
            AblationFlags(time_recurr=False),
            AblationFlags(level_memory=False),
            AblationFlags(normalize_features=False),
            AblationFlags(subdivide_features=False),
        ]:
            cfg = tiny_cfg(ablation=flags)
            model = M4Depth(cfg)
            rgb, rot, trans, cam = make_inputs(rng, b=1, T=2, h=16, w=16)
            params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)
            preds = model.apply(params, rgb, rot, trans, cam)
            assert np.all(np.isfinite(np.array(preds[1][0].depth)))


class TestRemat:
    def test_remat_matches_plain_forward_and_grads(self):
        rng = np.random.RandomState(9)
        rgb, rot, trans, cam = make_inputs(rng, b=1, T=2, h=32, w=32)
        gt = jnp.asarray(rng.uniform(5, 50, (1, 2, 32, 32, 1)).astype(np.float32))

        models = {}
        for name, remat in [("plain", False), ("remat", True)]:
            cfg = tiny_cfg(remat=remat) if False else ModelConfig(
                num_levels=3, encoder_channels=(8, 12, 16),
                refiner_prep_channels=(16, 16, 8),
                refiner_est_channels=(8, 8, 5), remat=remat)
            model = M4Depth(cfg)
            params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)

            def loss_fn(p, model=model):
                preds = model.apply(p, rgb, rot, trans, cam)
                return m4depth_loss(gt, preds)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            models[name] = (float(loss), grads)

        np.testing.assert_allclose(models["plain"][0], models["remat"][0],
                                   rtol=1e-5)
        g1 = jax.tree_util.tree_leaves(models["plain"][1])
        g2 = jax.tree_util.tree_leaves(models["remat"][1])
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.array(a), np.array(b),
                                       rtol=1e-4, atol=1e-6)


class TestTraining:
    @pytest.mark.slow
    def test_loss_decreases(self):
        rng = np.random.RandomState(5)
        cfg = tiny_cfg()
        model = M4Depth(cfg)
        rgb, rot, trans, cam = make_inputs(rng, b=1, T=2, h=32, w=32)
        gt = jnp.asarray(rng.uniform(5.0, 50.0, (1, 2, 32, 32, 1)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), rgb, rot, trans, cam)

        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                preds = model.apply(p, rgb, rot, trans, cam)
                return m4depth_loss(gt, preds)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for _ in range(30):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7, losses


class TestFirstConv:
    @pytest.mark.parametrize("stride,hw", [(1, (15, 17)), (2, (15, 17)),
                                           (2, (16, 18)), (1, (9, 8))])
    def test_matches_nn_conv(self, stride, hw):
        """The shifts+matmul first conv must equal a flax 3x3 'SAME' conv
        with the identical [3,3,3,C] parameters, odd sizes included."""
        import flax.linen as nn

        from m4depth_tpu.models.encoder import FirstConv

        h, w = hw
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        fc = FirstConv(8, stride=stride)
        params = fc.init(jax.random.PRNGKey(0), x)
        conv = nn.Conv(8, (3, 3), strides=(stride, stride), padding="SAME")
        got = fc.apply(params, x)
        expected = conv.apply({"params": dict(params["params"])}, x)
        assert got.shape == expected.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)

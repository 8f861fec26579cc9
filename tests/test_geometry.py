"""Unit tests for the 6-DoF parallax geometry core.

Closed-form cases (pure translation, pure rotation, roundtrips) — the test
pyramid the reference repo lacks (SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from m4depth_tpu.geometry import (
    Camera,
    depth_to_parallax,
    parallax_to_depth,
    parallax_sweep_flows,
    pixel_grid,
    prev_depth_to_parallax,
    recompute_depth,
    reprojection_flow,
    resize_bilinear,
    resize_bilinear_v1,
    resize_nearest,
    rot_mat,
    scale_camera,
)


def make_camera(b=2, f=(32.0, 32.0), c=(32.0, 32.0)):
    return Camera(
        f=jnp.tile(jnp.array([f], jnp.float32), (b, 1)),
        c=jnp.tile(jnp.array([c], jnp.float32), (b, 1)),
    )


def quat(w, x, y, z):
    q = np.array([w, x, y, z], np.float64)
    q = q / np.linalg.norm(q)
    return q.astype(np.float32)


class TestRotations:
    def test_identity_quaternion(self):
        q = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        np.testing.assert_allclose(rot_mat(q)[0], np.eye(3), atol=1e-6)

    def test_z_rotation_90(self):
        # 90 deg about z: (w, x, y, z) = (cos45, 0, 0, sin45)
        q = jnp.array([quat(np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4))])
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(rot_mat(q)[0], expected, atol=1e-6)

    def test_small_angle(self):
        r = jnp.array([[0.01, -0.02, 0.03]], jnp.float32)
        m = np.array(rot_mat(r)[0])
        expected = np.array(
            [[1, -0.03, -0.02], [0.03, 1, -0.01], [0.02, 0.01, 1]], np.float32
        )
        np.testing.assert_allclose(m, expected, atol=1e-7)

    def test_orthogonality(self):
        rng = np.random.RandomState(0)
        q = rng.randn(4, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        R = np.array(rot_mat(jnp.asarray(q)))
        for i in range(4):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)


class TestPixelGrid:
    def test_centers_and_normalization(self):
        cam = make_camera(b=1, f=(10.0, 20.0), c=(2.0, 3.0))
        coords, mesh = pixel_grid(4, 6, cam)
        assert coords.shape == (1, 4, 6, 3)
        # pixel (y=0, x=0) center is (0.5, 0.5)
        np.testing.assert_allclose(mesh[0, 0, 0], [0.5 - 2.0, 0.5 - 3.0], atol=1e-6)
        np.testing.assert_allclose(
            coords[0, 2, 5], [(5.5 - 2.0) / 10.0, (2.5 - 3.0) / 20.0, 1.0], atol=1e-6
        )


class TestParallaxDepth:
    def test_roundtrip(self):
        rng = np.random.RandomState(1)
        b, h, w = 2, 8, 8
        cam = make_camera(b)
        depth = jnp.asarray(rng.uniform(2.0, 100.0, (b, h, w, 1)).astype(np.float32))
        rot = jnp.asarray(
            np.stack([quat(1, 0.02, -0.01, 0.03), quat(1, -0.05, 0.01, 0.0)])
        )
        trans = jnp.asarray(
            np.array([[0.2, -0.1, 1.0], [-0.3, 0.2, 0.5]], np.float32)
        )
        para = depth_to_parallax(depth, rot, trans, cam)
        back = parallax_to_depth(para, rot, trans, cam)
        np.testing.assert_allclose(np.array(back), np.array(depth), rtol=1e-3)

    def test_pure_translation_closed_form(self):
        """R = I: disp = |t_xy*f - t_z*mesh| / (d + t_z)."""
        b, h, w = 1, 6, 6
        cam = make_camera(b, f=(16.0, 16.0), c=(3.0, 3.0))
        depth = jnp.full((b, h, w, 1), 10.0, jnp.float32)
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.array([[0.5, -0.25, 0.8]], jnp.float32)
        para = np.array(depth_to_parallax(depth, rot, trans, cam))

        _, mesh = pixel_grid(h, w, cam)
        mesh = np.array(mesh)
        t_xy_f = np.array([0.5 * 16.0, -0.25 * 16.0])
        expected = np.linalg.norm(
            t_xy_f[None, None, None] - 0.8 * mesh, axis=-1, keepdims=True
        ) / (10.0 + 0.8)
        np.testing.assert_allclose(para, expected, rtol=1e-5)

    def test_prev_parallax_pure_translation(self):
        """For R=I, forward motion only: prev parallax formula
        |t_xy*f - t_z*(p - c)| / (d_prev - t_z)."""
        b, h, w = 1, 5, 5
        cam = make_camera(b, f=(8.0, 8.0), c=(2.5, 2.5))
        prev_d = jnp.full((b, h, w, 1), 20.0, jnp.float32)
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.array([[0.1, 0.2, 1.5]], jnp.float32)
        para = np.array(prev_depth_to_parallax(prev_d, rot, trans, cam))

        _, mesh = pixel_grid(h, w, cam)
        mesh = np.array(mesh)
        t_xy_f = np.array([0.1 * 8.0, 0.2 * 8.0])
        expected = np.linalg.norm(
            t_xy_f[None, None, None] - 1.5 * mesh, axis=-1, keepdims=True
        ) / (20.0 - 1.5)
        np.testing.assert_allclose(para, expected, rtol=1e-5)

    def test_prev_parallax_stops_gradient(self):
        cam = make_camera(1)
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.array([[0.1, 0.0, 0.5]], jnp.float32)

        def f(d):
            return prev_depth_to_parallax(d, rot, trans, cam).sum()

        g = jax.grad(f)(jnp.full((1, 4, 4, 1), 10.0, jnp.float32))
        np.testing.assert_allclose(np.array(g), 0.0)


class TestFlows:
    def test_zero_motion_zero_flow(self):
        cam = make_camera(1)
        depth = jnp.full((1, 8, 8, 1), 5.0, jnp.float32)
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.zeros((1, 3), jnp.float32)
        flow = np.array(reprojection_flow(depth, rot, trans, cam))
        np.testing.assert_allclose(flow, 0.0, atol=1e-5)

    def test_sweep_center_matches_reprojection(self):
        """Hypothesis k=0 with center = depth_to_parallax(d) must land on the
        exact reprojection flow (DSCV core identity)."""
        rng = np.random.RandomState(3)
        b, h, w = 2, 8, 8
        cam = make_camera(b)
        depth = jnp.asarray(rng.uniform(3.0, 50.0, (b, h, w, 1)).astype(np.float32))
        rot = jnp.asarray(
            np.stack([quat(1, 0.01, 0.02, -0.01), quat(1, 0.0, -0.03, 0.02)])
        )
        trans = jnp.asarray(np.array([[0.3, 0.1, 0.9], [-0.2, 0.4, 1.2]], np.float32))

        para = depth_to_parallax(depth, rot, trans, cam)
        sweep = parallax_sweep_flows(para, rot, trans, cam, search_range=2)
        center = np.array(sweep[:, 2])  # k = 0
        expected = np.array(reprojection_flow(depth, rot, trans, cam))
        np.testing.assert_allclose(center, expected, rtol=1e-3, atol=1e-3)

    def test_sweep_shape_and_monotone(self):
        cam = make_camera(1)
        para = jnp.full((1, 4, 4, 1), 5.0, jnp.float32)
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.array([[1.0, 0.0, 0.0]], jnp.float32)
        flows = np.array(parallax_sweep_flows(para, rot, trans, cam, 4))
        assert flows.shape == (1, 9, 4, 4, 2)
        # pure +x translation: sampling positions march along +x with k
        dx = flows[0, :, 2, 2, 0]
        assert np.all(np.diff(dx) > 0)


class TestRecomputeDepth:
    def test_zero_motion_identity(self):
        cam = make_camera(1)
        depth = jnp.full((1, 6, 6, 1), 7.0, jnp.float32)
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.zeros((1, 3), jnp.float32)
        out = np.array(recompute_depth(depth, rot, trans, cam))
        np.testing.assert_allclose(out, 7.0, atol=1e-5)

    def test_forward_motion_reduces_depth(self):
        cam = make_camera(1)
        depth = jnp.full((1, 6, 6, 1), 7.0, jnp.float32)
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.array([[0.0, 0.0, 2.0]], jnp.float32)
        out = np.array(recompute_depth(depth, rot, trans, cam))
        np.testing.assert_allclose(out, 5.0, atol=1e-5)


class TestResize:
    def test_v1_upsample_grid(self):
        # legacy grid: src = dst * (src/dst); 2 -> 4 gives [a, lerp.5, b, b]
        x = jnp.array([[1.0], [3.0]], jnp.float32).reshape(1, 2, 1, 1)
        out = np.array(resize_bilinear_v1(x, (4, 1)))[0, :, 0, 0]
        np.testing.assert_allclose(out, [1.0, 2.0, 3.0, 3.0], atol=1e-6)

    def test_v1_identity(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 5, 7, 3).astype(np.float32))
        np.testing.assert_allclose(np.array(resize_bilinear_v1(x, (5, 7))), np.array(x))

    def test_half_pixel_upsample(self):
        # modern grid 2 -> 4: pos = (i+.5)*.5-.5 = [-.25,.25,.75,1.25]
        x = jnp.array([[0.0], [4.0]], jnp.float32).reshape(1, 2, 1, 1)
        out = np.array(resize_bilinear(x, (4, 1)))[0, :, 0, 0]
        np.testing.assert_allclose(out, [0.0, 1.0, 3.0, 4.0], atol=1e-6)

    def test_nearest_half_pixel(self):
        # 4 -> 2: idx = floor((i+.5)*2) = [1, 3]
        x = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1, 1)
        out = np.array(resize_nearest(x, (2, 1)))[0, :, 0, 0]
        np.testing.assert_allclose(out, [1.0, 3.0])

    def test_downsample_matches_numpy_oracle(self):
        rng = np.random.RandomState(7)
        x = rng.randn(2, 8, 12, 3).astype(np.float32)
        out = np.array(resize_bilinear_v1(jnp.asarray(x), (3, 5)))

        def oracle_axis(a, axis, dst):
            src = a.shape[axis]
            pos = np.arange(dst) * (src / dst)
            lo = np.minimum(np.floor(pos).astype(int), src - 1)
            hi = np.minimum(lo + 1, src - 1)
            frac = (pos - lo).reshape([-1 if i == axis else 1 for i in range(a.ndim)])
            return np.take(a, lo, axis=axis) + (
                np.take(a, hi, axis=axis) - np.take(a, lo, axis=axis)
            ) * frac

        expected = oracle_axis(oracle_axis(x, 1, 3), 2, 5)
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


class TestScaleCamera:
    def test_scale(self):
        cam = make_camera(1, f=(64.0, 64.0), c=(32.0, 16.0))
        s = scale_camera(cam, 4.0)
        np.testing.assert_allclose(np.array(s.f), [[16.0, 16.0]])
        np.testing.assert_allclose(np.array(s.c), [[8.0, 4.0]])

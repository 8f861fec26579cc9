"""Golden tests for the dense warp against a numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from m4depth_tpu.ops.warp import dense_image_warp


def numpy_warp(image, flow):
    """Oracle: bilinear backward warp with border clamp (floor in [0, n-2],
    frac in [0, 1]) — matches the reference fallback semantics
    (utils/dense_image_warp.py:61-192)."""
    b, h, w, c = image.shape
    out = np.zeros_like(image)
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                qx = x + flow[bi, y, x, 0]
                qy = y + flow[bi, y, x, 1]
                x0 = int(np.clip(np.floor(qx), 0, max(w - 2, 0)))
                y0 = int(np.clip(np.floor(qy), 0, max(h - 2, 0)))
                ax = np.clip(qx - x0, 0.0, 1.0)
                ay = np.clip(qy - y0, 0.0, 1.0)
                tl = image[bi, y0, x0]
                tr = image[bi, y0, x0 + 1]
                bl = image[bi, y0 + 1, x0]
                br = image[bi, y0 + 1, x0 + 1]
                top = tl + (tr - tl) * ax
                bot = bl + (br - bl) * ax
                out[bi, y, x] = top + (bot - top) * ay
    return out


class TestDenseImageWarp:
    def test_zero_flow_identity(self):
        rng = np.random.RandomState(0)
        img = jnp.asarray(rng.randn(2, 6, 7, 3).astype(np.float32))
        out = dense_image_warp(img, jnp.zeros((2, 6, 7, 2), jnp.float32))
        np.testing.assert_allclose(np.array(out), np.array(img), atol=1e-6)

    def test_integer_shift(self):
        img = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        flow = jnp.full((1, 4, 4, 2), 0.0, jnp.float32).at[..., 0].set(1.0)
        out = np.array(dense_image_warp(img, flow))[0, :, :, 0]
        expected = np.array(img)[0, :, :, 0]
        # out[y, x] = img[y, x+1]; last column clamps to border
        np.testing.assert_allclose(out[:, :3], expected[:, 1:], atol=1e-6)
        np.testing.assert_allclose(out[:, 3], expected[:, 3], atol=1e-6)

    def test_matches_numpy_oracle_random(self):
        rng = np.random.RandomState(42)
        img = rng.randn(3, 9, 11, 4).astype(np.float32)
        flow = (rng.randn(3, 9, 11, 2) * 4.0).astype(np.float32)
        out = np.array(dense_image_warp(jnp.asarray(img), jnp.asarray(flow)))
        expected = numpy_warp(img, flow)
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_far_out_of_bounds_clamps(self):
        img = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
        flow = jnp.full((1, 3, 4, 2), 100.0, jnp.float32)
        out = np.array(dense_image_warp(img, flow))
        np.testing.assert_allclose(out, 11.0, atol=1e-6)  # bottom-right pixel

    def test_leading_dims(self):
        rng = np.random.RandomState(1)
        img = rng.randn(2, 5, 6, 7, 3).astype(np.float32)
        flow = (rng.randn(2, 5, 6, 7, 2) * 2).astype(np.float32)
        out = np.array(dense_image_warp(jnp.asarray(img), jnp.asarray(flow)))
        expected = numpy_warp(
            img.reshape(10, 6, 7, 3), flow.reshape(10, 6, 7, 2)
        ).reshape(2, 5, 6, 7, 3)
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_differentiable_wrt_image_and_flow(self):
        rng = np.random.RandomState(2)
        img = jnp.asarray(rng.randn(1, 5, 5, 2).astype(np.float32))
        flow = jnp.asarray((rng.randn(1, 5, 5, 2) * 0.3).astype(np.float32))

        g_img = jax.grad(lambda i: dense_image_warp(i, flow).sum())(img)
        g_flow = jax.grad(lambda f: dense_image_warp(img, f).sum())(flow)
        assert np.all(np.isfinite(np.array(g_img)))
        assert np.all(np.isfinite(np.array(g_flow)))
        # image gradient is a scatter of ones-weights: sums to h*w per batch
        np.testing.assert_allclose(np.array(g_img).sum(), 25 * 2, rtol=1e-4)

    def test_flow_gradient_finite_differences(self):
        rng = np.random.RandomState(3)
        img = rng.randn(1, 6, 6, 1).astype(np.float32)
        flow = (rng.rand(1, 6, 6, 2).astype(np.float32) - 0.5) * 2.0

        def f(fl):
            return dense_image_warp(jnp.asarray(img), fl).sum()

        g = np.array(jax.grad(f)(jnp.asarray(flow)))
        eps = 1e-3
        for (y, x, k) in [(2, 3, 0), (4, 1, 1)]:
            fp = flow.copy()
            fp[0, y, x, k] += eps
            fm = flow.copy()
            fm[0, y, x, k] -= eps
            fd = (numpy_warp(img, fp).sum() - numpy_warp(img, fm).sum()) / (2 * eps)
            np.testing.assert_allclose(g[0, y, x, k], fd, atol=2e-2)

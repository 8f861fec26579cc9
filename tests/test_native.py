"""Native C++ backproject vs the jnp warp (forward) and jax.grad (backward)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from m4depth_tpu import native
from m4depth_tpu.ops.warp import dense_image_warp

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


class TestNativeBackproject:
    def test_forward_matches_jnp(self):
        rng = np.random.RandomState(0)
        img = rng.randn(3, 9, 11, 4).astype(np.float32)
        flow = (rng.randn(3, 9, 11, 2) * 4).astype(np.float32)
        out = native.backproject_forward(img, flow)
        expected = np.array(dense_image_warp(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_backward_matches_jax_grad(self):
        rng = np.random.RandomState(1)
        img = rng.randn(2, 7, 8, 3).astype(np.float32)
        flow = (rng.randn(2, 7, 8, 2) * 2).astype(np.float32)
        grad = rng.randn(2, 7, 8, 3).astype(np.float32)

        def f(i, fl):
            return (dense_image_warp(i, fl) * jnp.asarray(grad)).sum()

        gi, gf = jax.grad(f, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(flow))
        dimg, dflow = native.backproject_backward(img, flow, grad)
        np.testing.assert_allclose(dimg, np.array(gi), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(dflow, np.array(gf), rtol=1e-4, atol=1e-4)

    def test_multithreaded_matches_single(self):
        rng = np.random.RandomState(2)
        img = rng.randn(8, 16, 16, 4).astype(np.float32)
        flow = (rng.randn(8, 16, 16, 2) * 3).astype(np.float32)
        a = native.backproject_forward(img, flow, threads=1)
        b = native.backproject_forward(img, flow, threads=8)
        np.testing.assert_array_equal(a, b)

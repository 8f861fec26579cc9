"""Pallas SNCV kernel vs the XLA formulation (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from m4depth_tpu.ops.cost_volume import spatial_cost_volume
from m4depth_tpu.ops.sncv_pallas import spatial_cost_volume_pallas


class TestSNCVPallas:
    def test_matches_xla_single_cut(self):
        rng = np.random.RandomState(0)
        c = jnp.asarray(rng.randn(2, 16, 12, 8).astype(np.float32))
        ref = spatial_cost_volume(c, c, 2, num_cuts=1, cv_dtype=jnp.float32)
        out = spatial_cost_volume_pallas(c, c, 2, num_cuts=1,
                                         cv_dtype=jnp.float32, interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_matches_xla_multi_cut_odd_rows(self):
        rng = np.random.RandomState(1)
        # h=6 not divisible by 8 -> single row-tile path
        c1 = jnp.asarray(rng.randn(1, 6, 10, 8).astype(np.float32))
        c2 = jnp.asarray(rng.randn(1, 6, 10, 8).astype(np.float32))
        ref = spatial_cost_volume(c1, c2, 3, num_cuts=4, cv_dtype=jnp.float32)
        out = spatial_cost_volume_pallas(c1, c2, 3, num_cuts=4,
                                         cv_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_custom_vjp_matches_xla_grad(self):
        import jax

        rng = np.random.RandomState(3)
        c1 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
        c2 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
        gout = jnp.asarray(rng.randn(1, 8, 8, 25 * 2).astype(np.float32))

        def f_ref(a, b):
            return (spatial_cost_volume(a, b, 2, num_cuts=2,
                                        cv_dtype=jnp.float32) * gout).sum()

        def f_pal(a, b):
            return (spatial_cost_volume_pallas(
                a, b, 2, 1, 2, jnp.float32, 0.1, True) * gout).sum()

        g_ref = jax.grad(f_ref, argnums=(0, 1))(c1, c2)
        g_pal = jax.grad(f_pal, argnums=(0, 1))(c1, c2)
        np.testing.assert_allclose(np.array(g_pal[0]), np.array(g_ref[0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.array(g_pal[1]), np.array(g_ref[1]),
                                   rtol=1e-4, atol=1e-5)

    def test_dilation(self):
        rng = np.random.RandomState(2)
        c = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
        ref = spatial_cost_volume(c, c, 1, dilation_rate=2, num_cuts=1,
                                  cv_dtype=jnp.float32)
        out = spatial_cost_volume_pallas(c, c, 1, dilation_rate=2, num_cuts=1,
                                         cv_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   rtol=1e-4, atol=1e-5)

"""Tests for the DSCV and SNCV cost volumes."""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from m4depth_tpu.geometry import Camera, depth_to_parallax
from m4depth_tpu.ops.cost_volume import (
    parallax_sweeping_cv,
    parallax_sweeping_cv_expanded,
    parallax_sweeping_cv_flat,
    parallax_sweeping_cv_rows,
    parallax_sweeping_cv_split,
    spatial_cost_volume,
)

# every fast DSCV formulation, checked against the direct per-hypothesis warp
FAST_DSCV_IMPLS = {
    "expanded": parallax_sweeping_cv_expanded,
    "flat": parallax_sweeping_cv_flat,
    "split1": functools.partial(parallax_sweeping_cv_split, n_chunks=1),
    "split3": functools.partial(parallax_sweeping_cv_split, n_chunks=3),
    # auto-chunking with a tiny budget: exercises the bytes-driven split
    "split_auto": functools.partial(parallax_sweeping_cv_split,
                                    chunk_bytes=4096),
    # features-only expanded map, parallax warped directly (values AND
    # gradients must still match the gather formulation exactly in fp32)
    "split_pd": functools.partial(parallax_sweeping_cv_split, n_chunks=3,
                                  para_direct_warp=True),
    # alternate training backwards (forward identical; gradient parity here
    # is the correctness gate): the hand-derived corner-scatter VJP and the
    # Pallas VMEM-accumulator fetch VJP (interpret mode on CPU)
    "split_corner1": functools.partial(parallax_sweeping_cv_split,
                                       n_chunks=1, bwd_impl="corner"),
    "split_corner3": functools.partial(parallax_sweeping_cv_split,
                                       n_chunks=3, bwd_impl="corner"),
    "split_bwdk1": functools.partial(parallax_sweeping_cv_split, n_chunks=1,
                                     bwd_impl="pallas"),
    "split_bwdk3": functools.partial(parallax_sweeping_cv_split, n_chunks=3,
                                     bwd_impl="pallas"),
    # row-fetch formulation: d/G rows per pixel from a G*d-shift operand
    # (collapses the d^2 expansion build); every G must be tap-for-tap equal
    "rows_g1": functools.partial(parallax_sweeping_cv_rows, row_group=1),
    "rows_g2": functools.partial(parallax_sweeping_cv_rows, row_group=2),
    "rows_g5": functools.partial(parallax_sweeping_cv_rows, row_group=5),
    "rows_g10": functools.partial(parallax_sweeping_cv_rows, row_group=10),
}


def make_camera(b=1, f=(16.0, 16.0), c=(8.0, 8.0)):
    return Camera(
        f=jnp.tile(jnp.array([f], jnp.float32), (b, 1)),
        c=jnp.tile(jnp.array([c], jnp.float32), (b, 1)),
    )


def numpy_sncv(c1, c2, r, num_cuts, slope=0.1):
    b, h, w, C = c1.shape
    cc = C // num_cuts
    pad = np.pad(c2, ((0, 0), (r, r), (r, r), (0, 0)))
    outs = []
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            shifted = pad[:, dy:dy + h, dx:dx + w, :]
            prod = c1 * shifted
            for k in range(num_cuts):
                outs.append(prod[..., k * cc:(k + 1) * cc].mean(-1))
    cv = np.stack(outs, axis=-1)
    return np.where(cv > 0, cv, cv * slope)


class TestSNCV:
    def test_matches_numpy_oracle(self):
        rng = np.random.RandomState(0)
        c = rng.randn(2, 6, 7, 8).astype(np.float32)
        out = np.array(
            spatial_cost_volume(jnp.asarray(c), jnp.asarray(c), 2, num_cuts=2,
                                cv_dtype=jnp.float32)
        )
        expected = numpy_sncv(c, c, 2, 2)
        assert out.shape == (2, 6, 7, 50)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_center_offset_is_self_energy(self):
        rng = np.random.RandomState(1)
        c = rng.randn(1, 5, 5, 4).astype(np.float32)
        out = np.array(
            spatial_cost_volume(jnp.asarray(c), jnp.asarray(c), 1, num_cuts=1,
                                cv_dtype=jnp.float32)
        )
        # offset index (dy=1, dx=1) of 3x3 window = channel 4 (cuts=1)
        center = out[0, :, :, 4]
        energy = (c[0] ** 2).mean(-1)
        expected = np.where(energy > 0, energy, energy * 0.1)
        np.testing.assert_allclose(center, expected, rtol=1e-4)

    def test_channel_count_scales_with_cuts(self):
        c = jnp.ones((1, 4, 4, 8), jnp.float32)
        out = spatial_cost_volume(c, c, 3, num_cuts=4)
        assert out.shape == (1, 4, 4, 49 * 4)

    def test_autocorrelation_symmetric_path_matches_direct(self):
        """When c1 IS c2 the symmetric fast path (half the correlation maps,
        mirrors derived by shifting) must equal the direct computation,
        including zero-padded borders, dilation, and gradients."""
        import jax

        rng = np.random.RandomState(3)
        c = jnp.asarray(rng.randn(2, 9, 11, 8).astype(np.float32))
        for r_, dil, cuts in [(3, 1, 2), (2, 2, 1), (1, 1, 4)]:
            sym = spatial_cost_volume(c, c, r_, dilation_rate=dil,
                                      num_cuts=cuts, cv_dtype=jnp.float32)
            direct = spatial_cost_volume(c, c + 0.0, r_, dilation_rate=dil,
                                         num_cuts=cuts, cv_dtype=jnp.float32)
            np.testing.assert_allclose(np.asarray(sym), np.asarray(direct),
                                       rtol=1e-5, atol=1e-6)
        g_sym = jax.grad(lambda x: (spatial_cost_volume(
            x, x, 2, num_cuts=1, cv_dtype=jnp.float32) ** 2).sum())(c)
        g_dir = jax.grad(lambda x: (spatial_cost_volume(
            x, x + 0.0, 2, num_cuts=1, cv_dtype=jnp.float32) ** 2).sum())(c)
        np.testing.assert_allclose(np.asarray(g_sym), np.asarray(g_dir),
                                   rtol=1e-4, atol=1e-5)


class TestDSCV:
    def test_shapes(self):
        b, h, w, C = 2, 8, 8, 8
        rng = np.random.RandomState(0)
        cam = make_camera(b)
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.full((b, h, w, 1), 2.0, jnp.float32)
        para_c = jnp.full((b, h, w, 1), 2.0, jnp.float32)
        rot = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (b, 1))
        trans = jnp.tile(jnp.array([[0.5, 0.0, 0.3]], jnp.float32), (b, 1))
        cv, para_w = parallax_sweeping_cv(
            c1, c2, para_t, para_c, rot, trans, cam, search_range=4, num_cuts=2
        )
        assert cv.shape == (b, h, w, 2 * 9)
        assert para_w.shape == (b, h, w, 9)

    def test_correct_hypothesis_wins(self):
        """Build c2 as an exact epipolar pre-image of c1 for a known depth;
        the hypothesis matching depth_to_parallax(depth) must score highest."""
        b, h, w, C = 1, 16, 16, 4
        cam = make_camera(b, f=(16.0, 16.0), c=(8.0, 8.0))
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.array([[0.4, 0.0, 0.0]], jnp.float32)  # pure +x translation
        depth = jnp.full((b, h, w, 1), 3.2, jnp.float32)
        para = depth_to_parallax(depth, rot, trans, cam)  # = 0.4*16/3.2 = 2.0
        np.testing.assert_allclose(np.array(para)[0, 0, 0, 0], 2.0, rtol=1e-5)

        # with pure +x translation, the reprojected sample position is
        # x + parallax; craft c2 so c2[y, x + 2] == c1[y, x]
        rng = np.random.RandomState(5)
        c2v = rng.randn(b, h, w, C).astype(np.float32)
        c2v /= np.linalg.norm(c2v, axis=-1, keepdims=True)
        c1v = np.roll(c2v, shift=-2, axis=2)  # c1[y,x] = c2[y,x+2]

        # sweep center = true parallax - 1 => winning hypothesis index r+1
        center = jnp.asarray(np.array(para) - 1.0)
        cv, _ = parallax_sweeping_cv(
            jnp.asarray(c1v), jnp.asarray(c2v), jnp.zeros((b, h, w, 1), jnp.float32),
            center, rot, trans, cam, search_range=4, num_cuts=1,
            cv_dtype=jnp.float32,
        )
        # interior pixels (avoid rolled wrap column and borders)
        scores = np.array(cv)[0, 4:12, 4:10, :]
        winner = scores.argmax(-1)
        assert (winner == 5).mean() > 0.9  # index 5 = offset +1 of 9

    def test_fp16_extreme_parallax_stays_finite(self):
        """Regression: the expanded-map impls store the temporal-parallax
        channel in cv_dtype; under float16 a degenerate (huge) parallax
        used to cast to inf and poison the masked weight contraction with
        NaN (inf * 0). The saturating cast must keep every output finite
        and leave the feature correlations untouched (they never saturate:
        features are L2-normalized)."""
        from m4depth_tpu.ops.cost_volume import (
            parallax_sweeping_cv_expanded,
            parallax_sweeping_cv_split,
        )

        rng = np.random.RandomState(3)
        b, h, w, C = 1, 12, 14, 8
        cam = make_camera(b, f=(10.0, 11.0), c=(7.0, 6.0))
        rot = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (b, 1))
        trans = jnp.tile(jnp.array([[0.3, 0.1, 0.2]], jnp.float32), (b, 1))
        c1 = rng.randn(b, h, w, C).astype(np.float32)
        c1 /= np.linalg.norm(c1, axis=-1, keepdims=True)
        c2 = rng.randn(b, h, w, C).astype(np.float32)
        c2 /= np.linalg.norm(c2, axis=-1, keepdims=True)
        # parallax far beyond float16's 65504 finite max (a near-zero
        # depth estimate under random init weights produces exactly this)
        para_t = jnp.full((b, h, w, 1), 1.0e6, jnp.float32)
        center = jnp.full((b, h, w, 1), 2.0, jnp.float32)

        for fn in (functools.partial(parallax_sweeping_cv_split, n_chunks=3),
                   parallax_sweeping_cv_expanded):
            cv, pw = fn(jnp.asarray(c1), jnp.asarray(c2), para_t, center,
                        rot, trans, cam, search_range=4,
                        cv_dtype=jnp.float16)
            assert np.isfinite(np.asarray(cv)).all()
            assert np.isfinite(np.asarray(pw)).all()
            # the warped parallax saturates at the fp16 max, not inf/NaN
            assert np.asarray(pw).max() <= 65504.0
            # correlations are unaffected by the parallax clamp
            cv_g, _ = parallax_sweeping_cv(
                jnp.asarray(c1), jnp.asarray(c2),
                jnp.zeros((b, h, w, 1), jnp.float32), center, rot, trans,
                cam, search_range=4, cv_dtype=jnp.float16)
            np.testing.assert_allclose(np.asarray(cv), np.asarray(cv_g),
                                       rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("impl", sorted(FAST_DSCV_IMPLS))
    def test_expanded_matches_gather_formulation(self, impl):
        """Every fast DSCV formulation must reproduce the direct
        per-hypothesis warp exactly (both in fp32)."""
        fast = FAST_DSCV_IMPLS[impl]
        rng = np.random.RandomState(7)
        b, h, w, C = 2, 12, 14, 8
        cam = make_camera(b, f=(10.0, 11.0), c=(7.0, 6.0))
        rot = jnp.asarray(np.stack([
            np.array([1.0, 0.01, -0.02, 0.005]) / np.linalg.norm(
                [1.0, 0.01, -0.02, 0.005]),
            np.array([1.0, -0.03, 0.01, 0.0]) / np.linalg.norm(
                [1.0, -0.03, 0.01, 0.0])]).astype(np.float32))
        trans = jnp.asarray(
            np.array([[0.3, 0.1, 0.8], [-0.2, 0.4, 1.1]], np.float32))
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(rng.uniform(0.5, 3, (b, h, w, 1)).astype(np.float32))
        # include small, large and clipped-sweep parallax centers
        center = jnp.asarray(
            rng.uniform(0.1, 8.0, (b, h, w, 1)).astype(np.float32))

        cv_ref, pw_ref = parallax_sweeping_cv(
            c1, c2, para_t, center, rot, trans, cam, 4, num_cuts=2,
            cv_dtype=jnp.float32)
        cv_exp, pw_exp = fast(
            c1, c2, para_t, center, rot, trans, cam, 4, num_cuts=2,
            cv_dtype=jnp.float32)
        np.testing.assert_allclose(np.array(cv_exp), np.array(cv_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.array(pw_exp), np.array(pw_ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("impl", sorted(FAST_DSCV_IMPLS))
    def test_expanded_matches_gather_tiny_level(self, impl):
        """Deepest-pyramid-level shapes (h, w smaller than the shift box)."""
        fast = FAST_DSCV_IMPLS[impl]
        rng = np.random.RandomState(12)
        b, h, w, C = 1, 6, 6, 8
        cam = make_camera(b, f=(3.0, 3.0), c=(3.0, 3.0))
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.array([[0.2, 0.1, 0.4]], jnp.float32)
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(rng.uniform(0.5, 20, (b, h, w, 1)).astype(np.float32))
        center = jnp.asarray(rng.uniform(0.1, 30, (b, h, w, 1)).astype(np.float32))
        cv_ref, pw_ref = parallax_sweeping_cv(
            c1, c2, para_t, center, rot, trans, cam, 4, num_cuts=4,
            cv_dtype=jnp.float32)
        cv_exp, pw_exp = fast(
            c1, c2, para_t, center, rot, trans, cam, 4, num_cuts=4,
            cv_dtype=jnp.float32)
        np.testing.assert_allclose(np.array(cv_exp), np.array(cv_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.array(pw_exp), np.array(pw_ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("impl", sorted(FAST_DSCV_IMPLS))
    def test_expanded_gradients_match_gather(self, impl):
        """Backward parity: every DSCV formulation must produce the same
        gradients (training correctness of the fast paths)."""
        import jax

        fast = FAST_DSCV_IMPLS[impl]
        rng = np.random.RandomState(11)
        b, h, w, C = 1, 10, 10, 4
        cam = make_camera(b, f=(8.0, 8.0), c=(5.0, 5.0))
        rot = jnp.array([[1.0, 0.01, -0.02, 0.0]], jnp.float32)
        rot = rot / jnp.linalg.norm(rot)
        trans = jnp.array([[0.3, 0.1, 0.6]], jnp.float32)
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(rng.uniform(0.5, 2, (b, h, w, 1)).astype(np.float32))
        center = jnp.asarray(rng.uniform(0.5, 3, (b, h, w, 1)).astype(np.float32))
        gcv = jnp.asarray(rng.randn(b, h, w, 9).astype(np.float32))
        gpw = jnp.asarray(rng.randn(b, h, w, 9).astype(np.float32))

        def loss(fn, c1_, c2_, center_):
            cv, pw = fn(c1_, c2_, para_t, center_, rot, trans, cam, 4,
                        num_cuts=1, cv_dtype=jnp.float32)
            return (cv * gcv).sum() + (pw * gpw).sum()

        g_ref = jax.grad(lambda *a: loss(parallax_sweeping_cv, *a),
                         argnums=(0, 1, 2))(c1, c2, center)
        g_exp = jax.grad(lambda *a: loss(fast, *a),
                         argnums=(0, 1, 2))(c1, c2, center)
        for a, b_ in zip(g_ref, g_exp):
            np.testing.assert_allclose(np.array(b_), np.array(a),
                                       rtol=1e-3, atol=1e-4)

    def test_pallas_bwd_wide_search_range(self):
        """Gradient parity of bwd_impl='pallas' at search_range=8 (d=18):
        the kernel's RMW band must widen with d — a fixed 24-row band only
        held (cx & 7) + d rows for d <= 17, and pltpu.roll is cyclic, so
        larger sweeps silently WRAPPED tail rows onto the band start
        (corrupted dc2/dpara with no error). Regression for the adaptive
        band in ops/dscv_bwd_pallas.py::fetch_grad."""
        import jax

        rng = np.random.RandomState(13)
        r = 8
        s = 2 * r + 1
        b, h, w, C = 1, 20, 20, 4
        cam = make_camera(b, f=(10.0, 10.0), c=(10.0, 10.0))
        rot = jnp.array([[1.0, 0.01, -0.02, 0.0]], jnp.float32)
        rot = rot / jnp.linalg.norm(rot)
        trans = jnp.array([[0.3, 0.1, 0.6]], jnp.float32)
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(
            rng.uniform(0.5, 2, (b, h, w, 1)).astype(np.float32))
        center = jnp.asarray(
            rng.uniform(0.5, 3, (b, h, w, 1)).astype(np.float32))
        gcv = jnp.asarray(rng.randn(b, h, w, s).astype(np.float32))
        gpw = jnp.asarray(rng.randn(b, h, w, s).astype(np.float32))

        def loss(fn, c1_, c2_, center_):
            cv, pw = fn(c1_, c2_, para_t, center_, rot, trans, cam, r,
                        num_cuts=1, cv_dtype=jnp.float32)
            return (cv * gcv).sum() + (pw * gpw).sum()

        fast = functools.partial(parallax_sweeping_cv_split, n_chunks=3,
                                 bwd_impl="pallas")
        g_ref = jax.grad(lambda *a: loss(parallax_sweeping_cv, *a),
                         argnums=(0, 1, 2))(c1, c2, center)
        g_exp = jax.grad(lambda *a: loss(fast, *a),
                         argnums=(0, 1, 2))(c1, c2, center)
        for a, b_ in zip(g_ref, g_exp):
            np.testing.assert_allclose(np.array(b_), np.array(a),
                                       rtol=1e-3, atol=1e-4)

    def test_expanded_gradients_finite(self):
        rng = np.random.RandomState(8)
        b, h, w, C = 1, 8, 8, 4
        cam = make_camera(b)
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.array([[0.3, 0.1, 0.2]], jnp.float32)
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(rng.uniform(1, 3, (b, h, w, 1)).astype(np.float32))
        center = jnp.asarray(rng.uniform(1, 3, (b, h, w, 1)).astype(np.float32))

        def loss(c1_, c2_, center_):
            cv, pw = parallax_sweeping_cv_expanded(
                c1_, c2_, para_t, center_, rot, trans, cam, 4, num_cuts=1,
                cv_dtype=jnp.float32)
            return (cv ** 2).sum() + (pw ** 2).sum()

        import jax

        grads = jax.grad(loss, argnums=(0, 1, 2))(c1, c2, center)
        for g in grads:
            assert np.all(np.isfinite(np.array(g)))

    def test_split_para_hyps_restriction_matches_center(self):
        """The production path passes para_hyps=(r,): its single warped-
        parallax channel must equal channel r of both the full split output
        and the gather impl (the decoder indexes it as channel 0 —
        m4depth_network.py:238-241 consumes only the center hypothesis)."""
        rng = np.random.RandomState(21)
        b, h, w, C = 2, 10, 12, 8
        r = 4
        cam = make_camera(b, f=(9.0, 8.0), c=(6.0, 5.0))
        rot = jnp.asarray(np.stack([
            np.array([1.0, 0.02, -0.01, 0.0]) / np.linalg.norm(
                [1.0, 0.02, -0.01, 0.0]),
            np.array([1.0, 0, 0.03, -0.01]) / np.linalg.norm(
                [1.0, 0, 0.03, -0.01])]).astype(np.float32))
        trans = jnp.asarray(
            np.array([[0.2, -0.1, 0.6], [0.1, 0.3, 0.9]], np.float32))
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(
            rng.uniform(0.5, 3, (b, h, w, 1)).astype(np.float32))
        center = jnp.asarray(
            rng.uniform(0.2, 6.0, (b, h, w, 1)).astype(np.float32))

        cv_full, pw_full = parallax_sweeping_cv_split(
            c1, c2, para_t, center, rot, trans, cam, r, num_cuts=2,
            cv_dtype=jnp.float32, n_chunks=3)
        cv_rest, pw_rest = parallax_sweeping_cv_split(
            c1, c2, para_t, center, rot, trans, cam, r, num_cuts=2,
            cv_dtype=jnp.float32, n_chunks=3, para_hyps=(r,))
        _, pw_gather = parallax_sweeping_cv(
            c1, c2, para_t, center, rot, trans, cam, r, num_cuts=2,
            cv_dtype=jnp.float32)

        assert pw_rest.shape[-1] == 1
        np.testing.assert_allclose(np.array(cv_rest), np.array(cv_full),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.array(pw_rest)[..., 0], np.array(pw_full)[..., r],
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.array(pw_rest)[..., 0], np.array(pw_gather)[..., r],
            rtol=1e-4, atol=1e-4)

    def test_rows_x_window_exact_on_steep_field(self):
        """The direction-narrowed fetch box (x_window, the "octant" lever)
        must be EXACT wherever the epipolar field is steep: pure-y
        translation with identity rotation makes every pixel's sweep
        direction vertical, so a G+4-wide window at a dynamic column base
        covers every tap the full d-wide row fetches."""
        rng = np.random.RandomState(33)
        b, h, w, C = 2, 12, 14, 8
        r = 4
        cam = make_camera(b, f=(10.0, 11.0), c=(7.0, 6.0))
        rot = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (b, 1))
        trans = jnp.asarray(
            np.array([[0.0, 0.5, 0.0], [0.0, -0.3, 0.0]], np.float32))
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(
            rng.uniform(0.5, 3, (b, h, w, 1)).astype(np.float32))
        center = jnp.asarray(
            rng.uniform(0.1, 8.0, (b, h, w, 1)).astype(np.float32))

        for G, dn in ((2, 6), (2, 8), (1, 5)):
            cv_full, pw_full = parallax_sweeping_cv_rows(
                c1, c2, para_t, center, rot, trans, cam, r, num_cuts=2,
                cv_dtype=jnp.float32, row_group=G)
            cv_n, pw_n = parallax_sweeping_cv_rows(
                c1, c2, para_t, center, rot, trans, cam, r, num_cuts=2,
                cv_dtype=jnp.float32, row_group=G, x_window=dn)
            np.testing.assert_allclose(np.array(cv_n), np.array(cv_full),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"G={G} dn={dn}")
            np.testing.assert_allclose(np.array(pw_n), np.array(pw_full),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"G={G} dn={dn}")
        # full-width window through the narrow code path is exact for ANY
        # motion (it degenerates to the d-wide fetch with base 0)
        rot2 = jnp.asarray(np.tile(
            np.array([[1.0, 0.01, -0.02, 0.005]], np.float32) /
            np.linalg.norm([1.0, 0.01, -0.02, 0.005]), (b, 1)))
        trans2 = jnp.asarray(
            np.array([[0.3, 0.1, 0.8], [-0.2, 0.4, 1.1]], np.float32))
        cv_ref, pw_ref = parallax_sweeping_cv(
            c1, c2, para_t, center, rot2, trans2, cam, r, num_cuts=2,
            cv_dtype=jnp.float32)
        cv_n, pw_n = parallax_sweeping_cv_rows(
            c1, c2, para_t, center, rot2, trans2, cam, r, num_cuts=2,
            cv_dtype=jnp.float32, row_group=2, x_window=2 * r + 2)
        np.testing.assert_allclose(np.array(cv_n), np.array(cv_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.array(pw_n), np.array(pw_ref), rtol=1e-4, atol=1e-4)

    def test_rows_x_window_para_hyps_and_grads(self):
        """x_window with the production para_hyps=(r,) restriction, and
        gradient parity vs the full rows impl on a steep field."""
        import jax

        rng = np.random.RandomState(34)
        b, h, w, C = 1, 10, 10, 4
        r = 4
        cam = make_camera(b, f=(8.0, 8.0), c=(5.0, 5.0))
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.array([[0.0, 0.4, 0.0]], jnp.float32)
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(
            rng.uniform(0.5, 2, (b, h, w, 1)).astype(np.float32))
        center = jnp.asarray(
            rng.uniform(0.5, 3, (b, h, w, 1)).astype(np.float32))
        gcv = jnp.asarray(rng.randn(b, h, w, 9).astype(np.float32))
        gpw = jnp.asarray(rng.randn(b, h, w, 1).astype(np.float32))

        def loss(dn, c1_, c2_, center_):
            cv, pw = parallax_sweeping_cv_rows(
                c1_, c2_, para_t, center_, rot, trans, cam, r, num_cuts=1,
                cv_dtype=jnp.float32, row_group=2, para_hyps=(r,),
                x_window=dn)
            assert pw.shape[-1] == 1
            return (cv * gcv).sum() + (pw * gpw).sum()

        g_full = jax.grad(functools.partial(loss, 0),
                          argnums=(0, 1, 2))(c1, c2, center)
        g_n = jax.grad(functools.partial(loss, 6),
                       argnums=(0, 1, 2))(c1, c2, center)
        for a, b_ in zip(g_full, g_n):
            np.testing.assert_allclose(np.array(b_), np.array(a),
                                       rtol=1e-4, atol=1e-5)

    def test_rows_xw_dual_exact_any_motion(self):
        """The dual-operand narrow fetch (x_window + x_window_dual, the
        two-bucket octant design) must be exact for EVERY motion at
        dn >= G+3 — including 45-degree epipolar fields and pixels whose
        taps clamp at the image border (the case that breaks a naive
        |ux|<=|uy| branch choice: clamping saturates one coordinate while
        the other keeps moving, so the branch is chosen by actual needed
        window span instead)."""
        rng = np.random.RandomState(44)
        b, h, w, C = 2, 14, 16, 8
        r = 4
        cam = make_camera(b, f=(7.0, 7.5), c=(8.0, 7.0))
        motions = [
            # pure forward: radial field spanning all octants
            (np.array([1.0, 0, 0, 0]), np.array([[0.0, 0.0, 0.9],
                                                 [0.0, 0.0, 1.3]])),
            # exact 45-degree translation (the branch boundary)
            (np.array([1.0, 0, 0, 0]), np.array([[0.5, 0.5, 0.0],
                                                 [-0.4, 0.4, 0.1]])),
            # shallow lateral
            (np.array([1.0, 0, 0, 0]), np.array([[0.7, 0.05, 0.0],
                                                 [-0.5, 0.0, 0.2]])),
            # rotation + mixed translation
            (np.array([0.999, 0.02, -0.03, 0.01]),
             np.array([[0.2, 0.3, 0.8], [0.3, -0.2, 0.6]])),
        ]
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(
            rng.uniform(0.5, 3, (b, h, w, 1)).astype(np.float32))
        # large sweep centers push taps off the border (the clamp case)
        center = jnp.asarray(
            rng.uniform(0.05, 8.0, (b, h, w, 1)).astype(np.float32))
        for rotn, transn in motions:
            rot = jnp.asarray(np.tile(
                (rotn / np.linalg.norm(rotn)).astype(np.float32), (b, 1)))
            trans = jnp.asarray(transn.astype(np.float32))
            for G, dn in ((2, 5), (2, 6), (1, 4)):
                cv_f, pw_f = parallax_sweeping_cv_rows(
                    c1, c2, para_t, center, rot, trans, cam, r, num_cuts=2,
                    cv_dtype=jnp.float32, row_group=G)
                cv_d, pw_d = parallax_sweeping_cv_rows(
                    c1, c2, para_t, center, rot, trans, cam, r, num_cuts=2,
                    cv_dtype=jnp.float32, row_group=G, x_window=dn,
                    x_window_dual=True)
                np.testing.assert_allclose(
                    np.array(cv_d), np.array(cv_f), rtol=1e-5, atol=1e-5,
                    err_msg=f"G={G} dn={dn} trans={transn[0]}")
                np.testing.assert_allclose(
                    np.array(pw_d), np.array(pw_f), rtol=1e-5, atol=1e-5,
                    err_msg=f"G={G} dn={dn} trans={transn[0]}")

    def test_rows_x_window_geq_d_falls_back_to_full(self):
        """The shipped default dscv_x_window=5 must stay valid for ANY
        search_range: when the window is >= d = 2r+2 the narrowing fetches
        everything anyway, so the op must take the plain full-width path
        (bit-equal output) instead of raising."""
        rng = np.random.RandomState(46)
        b, h, w, C = 1, 12, 12, 4
        r = 1  # d = 4 < the default window of 5
        cam = make_camera(b, f=(6.0, 6.0), c=(6.0, 6.0))
        rot = jnp.asarray(np.tile(
            np.array([1.0, 0.001, 0.002, 0.0], np.float32), (b, 1)))
        trans = jnp.array([[0.02, 0.01, 0.1]], jnp.float32)
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(
            rng.uniform(0.5, 2, (b, h, w, 1)).astype(np.float32))
        center = jnp.ones((b, h, w, 1), jnp.float32)
        full = parallax_sweeping_cv_rows(
            c1, c2, para_t, center, rot, trans, cam, r, num_cuts=1,
            cv_dtype=jnp.float32, row_group=2)
        for dual in (False, True):
            guarded = parallax_sweeping_cv_rows(
                c1, c2, para_t, center, rot, trans, cam, r, num_cuts=1,
                cv_dtype=jnp.float32, row_group=2, x_window=5,
                x_window_dual=dual)
            for a, b_ in zip(full, guarded):
                np.testing.assert_array_equal(np.array(a), np.array(b_))

    def test_rows_xw_dual_below_exactness_bound_raises(self):
        """With the now-default narrow window, a valid non-default row_group
        that violates x_window >= row_group+3 (e.g. G=5 with d=10) must be
        refused, not silently yield an inexact cost volume (advisor r4)."""
        rng = np.random.RandomState(47)
        b, h, w, C = 1, 16, 16, 4
        r = 4  # d = 10; G = 5 divides it but 5 < G+3 = 8
        cam = make_camera(b, f=(8.0, 8.0), c=(8.0, 8.0))
        rot = jnp.asarray(np.tile(
            np.array([1.0, 0.0, 0.0, 0.0], np.float32), (b, 1)))
        trans = jnp.array([[0.02, 0.01, 0.1]], jnp.float32)
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(
            rng.uniform(0.5, 2, (b, h, w, 1)).astype(np.float32))
        center = jnp.ones((b, h, w, 1), jnp.float32)
        with pytest.raises(ValueError, match="row_group"):
            parallax_sweeping_cv_rows(
                c1, c2, para_t, center, rot, trans, cam, r, num_cuts=1,
                cv_dtype=jnp.float32, row_group=5, x_window=5,
                x_window_dual=True)
        # at the bound it must run (exact; exactness itself is covered by
        # test_rows_xw_dual_exact_any_motion)
        parallax_sweeping_cv_rows(
            c1, c2, para_t, center, rot, trans, cam, r, num_cuts=1,
            cv_dtype=jnp.float32, row_group=2, x_window=5,
            x_window_dual=True)

    def test_rows_xw_dual_grads_and_para_hyps(self):
        """Gradient parity of the dual narrow fetch vs the full rows impl
        on a general (forward + rotation) motion — the production training
        path if the dual window becomes the default — plus the para_hyps
        restriction."""
        import jax

        rng = np.random.RandomState(45)
        b, h, w, C = 1, 12, 12, 4
        r = 4
        cam = make_camera(b, f=(6.0, 6.0), c=(6.0, 6.0))
        rotn = np.array([0.999, 0.015, -0.02, 0.008])
        rot = jnp.asarray(np.tile(
            (rotn / np.linalg.norm(rotn)).astype(np.float32), (b, 1)))
        trans = jnp.array([[0.25, 0.35, 0.7]], jnp.float32)
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(
            rng.uniform(0.5, 2, (b, h, w, 1)).astype(np.float32))
        center = jnp.asarray(
            rng.uniform(0.5, 3, (b, h, w, 1)).astype(np.float32))
        gcv = jnp.asarray(rng.randn(b, h, w, 9).astype(np.float32))
        gpw = jnp.asarray(rng.randn(b, h, w, 1).astype(np.float32))

        def loss(dual, c1_, c2_, center_):
            cv, pw = parallax_sweeping_cv_rows(
                c1_, c2_, para_t, center_, rot, trans, cam, r, num_cuts=1,
                cv_dtype=jnp.float32, row_group=2, para_hyps=(r,),
                x_window=5 if dual else 0, x_window_dual=dual)
            assert pw.shape[-1] == 1
            return (cv * gcv).sum() + (pw * gpw).sum()

        g_full = jax.grad(functools.partial(loss, False),
                          argnums=(0, 1, 2))(c1, c2, center)
        g_dual = jax.grad(functools.partial(loss, True),
                          argnums=(0, 1, 2))(c1, c2, center)
        for a, b_ in zip(g_full, g_dual):
            np.testing.assert_allclose(np.array(b_), np.array(a),
                                       rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("impls", [("split", "gather")])
    def test_model_level_split_vs_gather_forward(self, impls):
        """Full-model forward equivalence between the production split DSCV
        and the gather impl (catches a wrong hypothesis index in the
        restricted para_hyps path at the composition level)."""
        import jax as _jax

        from m4depth_tpu.config import ModelConfig
        from m4depth_tpu.models import M4Depth
        from m4depth_tpu.train import batch_camera

        rng = np.random.RandomState(3)
        b, T, h, w = 1, 3, 16, 16
        batch = {
            "rgb": rng.rand(b, T, h, w, 3).astype(np.float32),
            "rot": np.tile(np.array([1.0, 0, 0, 0], np.float32), (b, T, 1)),
            "trans": np.tile(np.array([0.05, 0.01, 0.3], np.float32),
                             (b, T, 1)),
            "camera_f": np.full((b, 2), 8.0, np.float32),
            "camera_c": np.full((b, 2), 8.0, np.float32),
        }
        outs = {}
        params = None
        for impl in impls[::-1]:
            cfg = ModelConfig(num_levels=2, encoder_channels=(8, 12),
                              refiner_prep_channels=(16, 16, 8),
                              refiner_est_channels=(8, 8, 5),
                              compute_dtype="float32", cv_dtype="float32",
                              dscv_impl=impl)
            model = M4Depth(cfg)
            if params is None:
                params = _jax.jit(model.init)(
                    _jax.random.PRNGKey(0), batch["rgb"], batch["rot"],
                    batch["trans"], batch_camera(batch))
            pyrs = model.apply(params, batch["rgb"], batch["rot"],
                               batch["trans"], batch_camera(batch))
            outs[impl] = np.array(pyrs[-1][0].depth)
        np.testing.assert_allclose(outs["split"], outs["gather"],
                                   rtol=2e-3, atol=2e-3)

    def test_model_level_rows_fused_matches_rows(self):
        """Full-model forward equivalence of dscv_impl='rows_fused' vs the
        shipped 'rows' default, sized so the finest level (48x48 = 2304 px)
        actually takes the Pallas kernel path (catches composition-level
        wiring bugs like a wrong para_hyps tuple — the hypothesis-index
        class of bug the split/gather test above guards)."""
        import jax as _jax

        from m4depth_tpu.config import ModelConfig
        from m4depth_tpu.models import M4Depth
        from m4depth_tpu.train import batch_camera

        rng = np.random.RandomState(9)
        b, T, h, w = 1, 2, 96, 96
        batch = {
            "rgb": rng.rand(b, T, h, w, 3).astype(np.float32),
            "rot": np.tile(np.array([1.0, 0.002, -0.001, 0.0005],
                                    np.float32), (b, T, 1)),
            "trans": np.tile(np.array([0.05, 0.02, 0.4], np.float32),
                             (b, T, 1)),
            "camera_f": np.full((b, 2), 48.0, np.float32),
            "camera_c": np.full((b, 2), 48.0, np.float32),
        }
        outs = {}
        params = None
        for impl in ("rows", "rows_fused"):
            cfg = ModelConfig(num_levels=2, encoder_channels=(8, 12),
                              refiner_prep_channels=(16, 16, 8),
                              refiner_est_channels=(8, 8, 5),
                              dscv_impl=impl)
            model = M4Depth(cfg)
            if params is None:
                params = _jax.jit(model.init)(
                    _jax.random.PRNGKey(0), batch["rgb"], batch["rot"],
                    batch["trans"], batch_camera(batch))
            pyrs = model.apply(params, batch["rgb"], batch["rot"],
                               batch["trans"], batch_camera(batch))
            outs[impl] = np.array(pyrs[-1][0].depth)
        # bf16-epsilon-scale differences (rows rounds corr to cv_dtype,
        # the kernel keeps f32 after the MXU), amplified one refiner pass
        np.testing.assert_allclose(outs["rows_fused"], outs["rows"],
                                   rtol=2e-2, atol=2e-2)

    def test_model_level_rows_dual_window_matches_full(self):
        """Full-model forward equivalence of the dual narrow window
        (dscv_x_window=5, dscv_xw_dual) vs the full-width rows impl, in
        f32 so the comparison is exact-math, on a mixed motion whose
        epipolar field crosses the 45-degree branch boundary."""
        import jax as _jax

        from m4depth_tpu.config import ModelConfig
        from m4depth_tpu.models import M4Depth
        from m4depth_tpu.train import batch_camera

        rng = np.random.RandomState(6)
        b, T, h, w = 1, 3, 16, 16
        batch = {
            "rgb": rng.rand(b, T, h, w, 3).astype(np.float32),
            "rot": np.tile(np.array([1.0, 0, 0, 0], np.float32), (b, T, 1)),
            "trans": np.tile(np.array([0.04, 0.04, 0.3], np.float32),
                             (b, T, 1)),
            "camera_f": np.full((b, 2), 8.0, np.float32),
            "camera_c": np.full((b, 2), 8.0, np.float32),
        }
        outs = {}
        params = None
        for dual in (True, False):
            cfg = ModelConfig(num_levels=2, encoder_channels=(8, 12),
                              refiner_prep_channels=(16, 16, 8),
                              refiner_est_channels=(8, 8, 5),
                              compute_dtype="float32", cv_dtype="float32",
                              dscv_impl="rows",
                              dscv_x_window=5 if dual else 0,
                              dscv_xw_dual=dual)
            model = M4Depth(cfg)
            if params is None:
                params = _jax.jit(model.init)(
                    _jax.random.PRNGKey(0), batch["rgb"], batch["rot"],
                    batch["trans"], batch_camera(batch))
            pyrs = model.apply(params, batch["rgb"], batch["rot"],
                               batch["trans"], batch_camera(batch))
            outs[dual] = np.array(pyrs[-1][0].depth)
        np.testing.assert_allclose(outs[True], outs[False],
                                   rtol=1e-5, atol=1e-6)

    def test_warped_prev_parallax_center_channel(self):
        """Channel r of the warped temporal parallax equals a warp of
        para_prev_t by the center-hypothesis flow."""
        b, h, w, C = 1, 8, 8, 4
        cam = make_camera(b)
        rot = jnp.array([[1.0, 0, 0, 0]], jnp.float32)
        trans = jnp.array([[0.3, 0.1, 0.2]], jnp.float32)
        rng = np.random.RandomState(2)
        c1 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        c2 = jnp.asarray(rng.randn(b, h, w, C).astype(np.float32))
        para_t = jnp.asarray(rng.uniform(1, 3, (b, h, w, 1)).astype(np.float32))
        center = jnp.full((b, h, w, 1), 2.0, jnp.float32)

        from m4depth_tpu.geometry import parallax_sweep_flows
        from m4depth_tpu.ops.warp import dense_image_warp

        _, para_w = parallax_sweeping_cv(
            c1, c2, para_t, center, rot, trans, cam, 4, num_cuts=1
        )
        flows = parallax_sweep_flows(center, rot, trans, cam, 4)
        expected = dense_image_warp(para_t, flows[:, 4])
        np.testing.assert_allclose(
            np.array(para_w)[..., 4:5], np.array(expected), rtol=1e-4, atol=1e-5
        )


class TestFusedAndInt8Variants:
    """Round-3 forward-path variants: the Pallas fused reduce
    (dscv_impl='fused') and the int8 expanded-map store. Both are
    config-gated serving options; parity is against the split impl."""

    def _inputs(self, b=1, h=48, w=64, C=16, seed=0):
        # h*w >= 2048 so the fused impl actually takes the kernel path
        rng = np.random.RandomState(seed)

        def norm(x):
            sq = (x * x).sum(-1, keepdims=True)
            return x / np.sqrt(np.maximum(sq, 1e-12))

        c1 = jnp.asarray(norm(rng.randn(b, h, w, C)).astype(np.float32))
        c2 = jnp.asarray(norm(rng.randn(b, h, w, C)).astype(np.float32))
        para = jnp.asarray((rng.rand(b, h, w, 1) * 3).astype(np.float32))
        center = jnp.asarray(
            (0.5 + rng.rand(b, h, w, 1) * 4).astype(np.float32))
        rot = jnp.asarray(np.tile([[1.0, 0.002, -0.001, 0.0005]], (b, 1))
                          .astype(np.float32))
        trans = jnp.asarray(np.tile([[0.05, 0.02, 0.4]], (b, 1))
                            .astype(np.float32))
        cam = Camera(
            f=jnp.full((b, 2), w * 0.6),
            c=jnp.asarray(np.tile([[w / 2, h / 2]], (b, 1))
                          .astype(np.float32)))
        return c1, c2, para, center, rot, trans, cam

    @pytest.mark.parametrize("cuts", [1, 2])
    def test_fused_matches_split(self, cuts):
        from m4depth_tpu.ops.cost_volume import parallax_sweeping_cv_fused

        c1, c2, para, center, rot, trans, cam = self._inputs()
        cv_s, pw_s = parallax_sweeping_cv_split(
            c1, c2, para, center, rot, trans, cam, 4, num_cuts=cuts,
            para_hyps=(4,))
        cv_f, pw_f = parallax_sweeping_cv_fused(
            c1, c2, para, center, rot, trans, cam, 4, num_cuts=cuts)
        # differences are split's bf16 rounding of corr (the kernel keeps
        # f32 after the MXU) — bf16-epsilon scale
        np.testing.assert_allclose(np.asarray(cv_f), np.asarray(cv_s),
                                   rtol=2e-2, atol=6e-3)
        np.testing.assert_allclose(np.asarray(pw_f), np.asarray(pw_s),
                                   rtol=2e-2, atol=3e-2)

    def test_fused_small_level_falls_back_to_split(self):
        from m4depth_tpu.ops.cost_volume import parallax_sweeping_cv_fused

        c1, c2, para, center, rot, trans, cam = self._inputs(h=16, w=16)
        cv_s, pw_s = parallax_sweeping_cv_split(
            c1, c2, para, center, rot, trans, cam, 4, para_hyps=(4,))
        cv_f, pw_f = parallax_sweeping_cv_fused(
            c1, c2, para, center, rot, trans, cam, 4)
        np.testing.assert_array_equal(np.asarray(cv_f), np.asarray(cv_s))
        np.testing.assert_array_equal(np.asarray(pw_f), np.asarray(pw_s))

    @pytest.mark.parametrize("cuts", [1, 2])
    def test_int8_store_matches_bf16(self, cuts):
        c1, c2, para, center, rot, trans, cam = self._inputs()
        cv_a, pw_a = parallax_sweeping_cv_split(
            c1, c2, para, center, rot, trans, cam, 4, num_cuts=cuts,
            para_hyps=(4,))
        cv_b, pw_b = parallax_sweeping_cv_split(
            c1, c2, para, center, rot, trans, cam, 4, num_cuts=cuts,
            para_hyps=(4,), store_int8=True)
        # int8 rounding noise (1/254 per element) is bf16-epsilon scale;
        # the warped parallax differs only by one fewer bf16 rounding
        np.testing.assert_allclose(np.asarray(cv_b), np.asarray(cv_a),
                                   rtol=2e-2, atol=4e-3)
        np.testing.assert_allclose(np.asarray(pw_b), np.asarray(pw_a),
                                   rtol=2e-2, atol=4e-2)

    @pytest.mark.parametrize("cuts", [1, 2])
    @pytest.mark.parametrize("mode", ["full", "single", "dual"])
    def test_rows_fused_matches_rows(self, mode, cuts):
        """rows_fused = rows build/gather + the Pallas reduce relabeled to
        the (dy-group, x-window) block grid (round-5 re-attack of the fused
        reduce on the narrow operand, VERDICT r4 #3). Parity target is the
        plain rows impl at the SAME (x_window, dual) flags — whatever the
        rows formulation computes, the kernel must reproduce."""
        from m4depth_tpu.ops.cost_volume import (
            parallax_sweeping_cv_rows,
            parallax_sweeping_cv_rows_fused,
        )

        xw = 0 if mode == "full" else 5
        dual = mode == "dual"
        c1, c2, para, center, rot, trans, cam = self._inputs()
        cv_r, pw_r = parallax_sweeping_cv_rows(
            c1, c2, para, center, rot, trans, cam, 4, num_cuts=cuts,
            row_group=2, para_hyps=(4,), x_window=xw, x_window_dual=dual)
        cv_f, pw_f = parallax_sweeping_cv_rows_fused(
            c1, c2, para, center, rot, trans, cam, 4, num_cuts=cuts,
            row_group=2, x_window=xw, x_window_dual=dual)
        # rows rounds corr to bf16 (cv_dtype) where the kernel keeps f32
        # after the MXU — bf16-epsilon-scale differences, as the split/fused
        # pair above
        np.testing.assert_allclose(np.asarray(cv_f), np.asarray(cv_r),
                                   rtol=2e-2, atol=6e-3)
        np.testing.assert_allclose(np.asarray(pw_f), np.asarray(pw_r),
                                   rtol=2e-2, atol=3e-2)

    def test_rows_fused_small_level_falls_back_to_rows(self):
        from m4depth_tpu.ops.cost_volume import (
            parallax_sweeping_cv_rows,
            parallax_sweeping_cv_rows_fused,
        )

        c1, c2, para, center, rot, trans, cam = self._inputs(h=16, w=16)
        cv_r, pw_r = parallax_sweeping_cv_rows(
            c1, c2, para, center, rot, trans, cam, 4, row_group=2,
            para_hyps=(4,), x_window=5, x_window_dual=True)
        cv_f, pw_f = parallax_sweeping_cv_rows_fused(
            c1, c2, para, center, rot, trans, cam, 4, row_group=2,
            x_window=5, x_window_dual=True)
        np.testing.assert_array_equal(np.asarray(cv_f), np.asarray(cv_r))
        np.testing.assert_array_equal(np.asarray(pw_f), np.asarray(pw_r))

    def test_int8_para_hyps_all(self):
        c1, c2, para, center, rot, trans, cam = self._inputs()
        _, pw_a = parallax_sweeping_cv_split(
            c1, c2, para, center, rot, trans, cam, 4)
        _, pw_b = parallax_sweeping_cv_split(
            c1, c2, para, center, rot, trans, cam, 4, store_int8=True)
        assert pw_b.shape == pw_a.shape
        np.testing.assert_allclose(np.asarray(pw_b), np.asarray(pw_a),
                                   rtol=2e-2, atol=4e-2)

"""The synthetic generator must be photometrically consistent with the
model's own reprojection operator — the core validation invariant."""

import numpy as np
import jax.numpy as jnp

from m4depth_tpu.data.synthetic import SyntheticGeometricDataset, make_sequence
from m4depth_tpu.geometry import Camera, reprojection_flow, depth_to_parallax
from m4depth_tpu.ops.warp import dense_image_warp


class TestSyntheticGeometry:
    def test_photometric_consistency(self):
        """warp(prev_frame, flow(gt_depth_cur, motion)) == cur_frame on the
        interior (border pixels clamp)."""
        rng = np.random.RandomState(0)
        seq = make_sequence(rng, T=3, h=48, w=48)
        cam = Camera(f=jnp.asarray(seq["camera_f"])[None],
                     c=jnp.asarray(seq["camera_c"])[None])
        for t in range(1, 3):
            cur_rgb = seq["RGB_im"][t]
            prev_rgb = seq["RGB_im"][t - 1]
            d_cur = seq["depth"][t]
            flow = reprojection_flow(
                jnp.asarray(d_cur)[None], jnp.asarray(seq["rot"][t])[None],
                jnp.asarray(seq["trans"][t])[None], cam)
            warped = np.asarray(
                dense_image_warp(jnp.asarray(prev_rgb)[None], flow))[0]
            interior = np.s_[6:-6, 6:-6]
            err = np.abs(warped[interior] - cur_rgb[interior]).mean()
            assert err < 0.015, err

    def test_depth_temporal_consistency(self):
        """Same-pixel depth must satisfy the parallax relations: parallax
        from depth is positive and finite; depths in sane range."""
        rng = np.random.RandomState(1)
        seq = make_sequence(rng, T=2, h=32, w=32)
        assert np.all(seq["depth"] > 1.0) and np.all(seq["depth"] < 100.0)
        cam = Camera(f=jnp.asarray(seq["camera_f"])[None],
                     c=jnp.asarray(seq["camera_c"])[None])
        para = np.asarray(depth_to_parallax(
            jnp.asarray(seq["depth"][1])[None],
            jnp.asarray(seq["rot"][1])[None],
            jnp.asarray(seq["trans"][1])[None], cam))
        assert np.all(np.isfinite(para)) and np.all(para > 0)

    def test_dataset_batches(self):
        ds = SyntheticGeometricDataset(n_batches=2, batch_size=2, T=2,
                                       h=32, w=32)
        batches = list(ds.batches(0))
        assert len(batches) == 2
        assert batches[0]["rgb"].shape == (2, 2, 32, 32, 3)
        assert batches[0]["depth"].shape == (2, 2, 32, 32, 1)
        # deterministic per epoch
        again = next(ds.batches(0))
        np.testing.assert_allclose(again["rgb"], batches[0]["rgb"])


class TestDeviceGenerator:
    def test_device_scenes_photometrically_consistent(self):
        """The on-device generator must satisfy the same warp invariant as
        the host renderer, with distinct scenes per key and bounded depth."""
        import jax

        from m4depth_tpu.data.synthetic import device_batch_sampler
        from m4depth_tpu.geometry import Camera, reprojection_flow
        from m4depth_tpu.ops.warp import dense_image_warp

        gen = device_batch_sampler(2, 3, 48, 48)
        b1 = gen(jax.random.PRNGKey(0))
        b2 = gen(jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(b1["rgb"]), np.asarray(b2["rgb"]))
        d = np.asarray(b1["depth"])
        assert d.min() > 1.0 and d.max() < 100.0
        cam = Camera(f=b1["camera_f"], c=b1["camera_c"])
        for t in (1, 2):
            flow = reprojection_flow(b1["depth"][:, t], b1["rot"][:, t],
                                     b1["trans"][:, t], cam)
            warped = np.asarray(dense_image_warp(b1["rgb"][:, t - 1], flow))
            cur = np.asarray(b1["rgb"][:, t])
            err = np.abs(warped[:, 6:-6, 6:-6] - cur[:, 6:-6, 6:-6]).mean()
            assert err < 0.015, (t, err)

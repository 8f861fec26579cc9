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


class TestExportMidAirFormat:
    def test_roundtrip_through_adapter(self, tmp_path):
        """Scenes exported to the Mid-Air on-disk layout must decode back
        through the real MidAirAdapter/SequenceDataset path with exact
        motion, near-exact depth (fp16 disparity storage) and 8-bit-exact
        color — the basis of the full-scale rehearsal's live validation."""
        import pytest

        pytest.importorskip("cv2")
        from m4depth_tpu.data import SequenceDataset, get_adapter
        from m4depth_tpu.data.synthetic import (
            export_midair_format,
            make_sequence,
        )

        db = tmp_path / "db"
        rec = tmp_path / "records"
        n = export_midair_format(str(db), str(rec), n_traj=1, frames=3,
                                 h=40, w=40, seed=5)
        assert n == 3
        seq = make_sequence(
            np.random.RandomState((5 * 9176 + 0) % (2 ** 31 - 1)), 3, 40, 40)

        ds = SequenceDataset(get_adapter("midair"), db_path=str(db),
                             records_path=str(rec), usecase="eval",
                             db_seq_len=None, seq_len=3, batch_size=1,
                             augment=False, out_size=(40, 40), num_workers=0)
        frames = list(ds.frames())
        assert len(frames) == 3
        for i, fr in enumerate(frames):
            np.testing.assert_allclose(fr["rot"][0], seq["rot"][i],
                                       rtol=0, atol=1e-6)
            np.testing.assert_allclose(fr["trans"][0], seq["trans"][i],
                                       rtol=0, atol=1e-6)
            assert bool(fr["new_traj"][0]) == (i == 0)
            np.testing.assert_allclose(fr["depth"][0], seq["depth"][i],
                                       rtol=2e-3, atol=0)  # fp16 disparity
            np.testing.assert_allclose(fr["rgb"][0], seq["RGB_im"][i],
                                       atol=1.0 / 255.0 + 1e-6)
            np.testing.assert_allclose(fr["camera_f"][0], seq["camera_f"])


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

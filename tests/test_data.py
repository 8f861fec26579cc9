"""Data layer tests: synthetic Mid-Air-style fixture on disk, pipeline
shapes, and geometric-consistency property tests for the augmentations."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from m4depth_tpu.data import SequenceDataset, get_adapter
from m4depth_tpu.data.augment import (
    color_augment,
    flip_augment,
    hsv_to_rgb,
    rgb_to_hsv,
    transpose_augment,
)
from m4depth_tpu.data.decode import load_midair_depth, resize_nearest_np


@pytest.fixture(scope="module")
def midair_fixture(tmp_path_factory):
    """Two 10-frame trajectories of 16x16 frames in Mid-Air manifest format."""
    root = tmp_path_factory.mktemp("midair_db")
    records = root / "records"
    rng = np.random.RandomState(0)
    for t in range(2):
        os.makedirs(records / f"traj_{t}", exist_ok=True)
        os.makedirs(root / "frames" / f"traj_{t}", exist_ok=True)
        lines = ["id\tcamera_l\tdisp\tqw\tqx\tqy\tqz\ttx\tty\ttz"]
        for i in range(10):
            img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            img_rel = f"frames/traj_{t}/c_{i}.jpg"
            cv2.imwrite(str(root / img_rel), img)
            # disparity = 512/depth stored as float16 bitcast in uint16
            depth = rng.uniform(5, 50, (16, 16)).astype(np.float32)
            disp16 = (512.0 / depth).astype(np.float16)
            d_rel = f"frames/traj_{t}/d_{i}.png"
            cv2.imwrite(str(root / d_rel), disp16.view(np.uint16))
            q = np.array([1.0, 0.01 * rng.randn(), 0.01 * rng.randn(),
                          0.01 * rng.randn()])
            q /= np.linalg.norm(q)
            tr = [0.05, 0.01, 0.4]
            lines.append(
                f"{i}\t{img_rel}\t{d_rel}\t" + "\t".join(f"{v:.6f}" for v in q)
                + "\t" + "\t".join(f"{v:.6f}" for v in tr))
        (records / f"traj_{t}" / "traj.csv").write_text("\n".join(lines))
    return str(root), str(records)


class TestDecode:
    def test_midair_depth_bitcast_roundtrip(self, tmp_path):
        depth = np.float32([[10.0, 20.0], [40.0, 5.0]])
        disp16 = (512.0 / depth).astype(np.float16)
        p = str(tmp_path / "d.png")
        cv2.imwrite(p, disp16.view(np.uint16))
        out = load_midair_depth(p)
        np.testing.assert_allclose(out[..., 0], depth, rtol=1e-2)

    def test_nearest_resize_half_pixel(self):
        img = np.arange(4, dtype=np.float32).reshape(4, 1, 1)
        out = resize_nearest_np(img, (2, 1))
        np.testing.assert_allclose(out[:, 0, 0], [1.0, 3.0])


class TestPipeline:
    def test_train_batches(self, midair_fixture):
        db, records = midair_fixture
        ds = SequenceDataset(
            get_adapter("midair"), db, records, usecase="train",
            db_seq_len=8, seq_len=4, batch_size=2, augment=False,
            out_size=(16, 16), num_workers=2)
        assert ds.num_batches == 1  # 2 trajs x (10//8) windows / batch 2
        batch = next(ds.batches(epoch=0))
        assert batch["rgb"].shape == (2, 4, 16, 16, 3)
        assert batch["depth"].shape == (2, 4, 16, 16, 1)
        assert batch["rot"].shape == (2, 4, 4)
        assert batch["trans"].shape == (2, 4, 3)
        assert batch["camera_f"].shape == (2, 2)
        np.testing.assert_array_equal(
            batch["new_traj"], [[True, False, False, False]] * 2)
        assert batch["rgb"].min() >= 0.0 and batch["rgb"].max() <= 1.0
        assert (batch["depth"] > 0).all()

    def test_train_shuffling_reshuffles_per_epoch(self, midair_fixture):
        db, records = midair_fixture
        ds = SequenceDataset(
            get_adapter("midair"), db, records, usecase="train",
            db_seq_len=4, seq_len=2, batch_size=1, augment=False,
            out_size=(16, 16), num_workers=0)
        b0 = [b["rgb"].sum() for b in ds.batches(epoch=0)]
        b0b = [b["rgb"].sum() for b in ds.batches(epoch=0)]
        np.testing.assert_allclose(b0, b0b)  # deterministic per epoch
        assert len(b0) == 4

    def test_streaming_eval_frames(self, midair_fixture):
        db, records = midair_fixture
        ds = SequenceDataset(
            get_adapter("midair"), db, records, usecase="eval",
            out_size=(16, 16), num_workers=2)
        frames = list(ds.frames())
        assert len(frames) == 20
        assert frames[0]["rgb"].shape == (1, 16, 16, 3)
        new_trajs = [bool(f["new_traj"][0]) for f in frames]
        assert new_trajs[0] and new_trajs[10]
        assert sum(new_trajs) == 2

    def test_windowed_frames_unrolled(self, midair_fixture):
        """frames() on a windowed dataset (db_seq_len set) must unroll the
        time axis into single frames — the whole [1, T, ...] window used to
        leak through, crashing any frames() consumer (--mode=predict with
        --db_seq_len set fed rank-5 rgb into the streaming step)."""
        db, records = midair_fixture
        ds = SequenceDataset(
            get_adapter("midair"), db, records, usecase="eval",
            db_seq_len=4, out_size=(16, 16), num_workers=2)
        frames = list(ds.frames())
        assert len(frames) == 16  # 2 trajs x (10//4) windows x 4 frames
        assert frames[0]["rgb"].shape == (1, 16, 16, 3)
        assert frames[0]["new_traj"].shape == (1,)
        assert bool(frames[0]["new_traj"][0])

    def test_windowed_eval(self, midair_fixture):
        db, records = midair_fixture
        ds = SequenceDataset(
            get_adapter("midair"), db, records, usecase="eval",
            db_seq_len=4, out_size=(16, 16), num_workers=2)
        batches = list(ds.batches())
        assert len(batches) == 4  # 2 trajs x (10//4) windows
        assert batches[0]["rgb"].shape == (1, 4, 16, 16, 3)


class TestAugmentGeometry:
    """Flip/transpose fixups must commute with the parallax geometry:
    parallax(flipped inputs) == flipped parallax(original inputs)."""

    def _setup(self, rng, h=8, w=8):
        import jax.numpy as jnp

        from m4depth_tpu.geometry import Camera, depth_to_parallax

        depth = rng.uniform(5, 50, (1, h, w, 1)).astype(np.float32)
        q = np.array([1.0, 0.03, -0.02, 0.01], np.float32)
        q /= np.linalg.norm(q)
        trans = np.array([[0.2, -0.1, 0.5]], np.float32)
        f = np.array([6.0, 7.0], np.float32)
        c = np.array([4.5, 3.5], np.float32)

        def para(d, qq, tt, ff, cc):
            cam = Camera(f=jnp.asarray(ff)[None], c=jnp.asarray(cc)[None])
            return np.array(depth_to_parallax(
                jnp.asarray(d), jnp.asarray(qq)[None], jnp.asarray(tt), cam))

        return depth, q, trans, f, c, para

    def _apply(self, aug_fn, depth, q, trans, c, h, w, rng_val):
        seq = {
            "RGB_im": np.zeros((1, h, w, 3), np.float32),
            "depth": depth.transpose(0, 1, 2, 3),  # [T=1,h,w,1]
            "rot": q[None].copy(),
            "trans": trans.copy(),
            "camera_c": c.copy(),
            "camera_f": None,
        }

        class FakeRng:
            def __init__(self, vals):
                self.vals = list(vals)

            def uniform(self, *a, **k):
                return self.vals.pop(0)

        return aug_fn(seq, FakeRng(rng_val))

    @pytest.mark.parametrize("which", ["v", "h", "transpose"])
    def test_flip_consistency(self, which):
        rng = np.random.RandomState(3)
        h, w = 8, 8
        depth, q, trans, f, c, para = self._setup(rng, h, w)
        p_orig = para(depth, q, trans, f, c)

        if which == "v":
            seq = self._apply(flip_augment, depth, q, trans, c, h, w, [0.0, 1.0])
            expected = p_orig[:, ::-1]
        elif which == "h":
            seq = self._apply(flip_augment, depth, q, trans, c, h, w, [1.0, 0.0])
            expected = p_orig[:, :, ::-1]
        else:
            seq = self._apply(transpose_augment, depth, q, trans, c, h, w, [0.0])
            expected = p_orig.transpose(0, 2, 1, 3)
            # transpose also swaps fx/fy and cx/cy roles
            f = f[::-1].copy()
            c = c[::-1].copy()

        if which == "transpose":
            seq["camera_c"] = c
        p_aug = para(seq["depth"], seq["rot"][0], seq["trans"], f,
                     seq["camera_c"])
        np.testing.assert_allclose(p_aug, expected, rtol=1e-4, atol=1e-6)


class TestColorAugment:
    def test_hsv_roundtrip(self):
        rng = np.random.RandomState(0)
        rgb = rng.rand(4, 5, 3).astype(np.float32)
        back = hsv_to_rgb(rgb_to_hsv(rgb))
        np.testing.assert_allclose(back, rgb, atol=1e-5)

    def test_sequence_consistency(self):
        """The same jitter must apply to every frame of a sequence."""
        rng = np.random.RandomState(1)
        frame = rng.rand(8, 8, 3).astype(np.float32)
        seq = np.stack([frame, frame])  # two identical frames
        out = color_augment(seq, np.random.RandomState(7))
        np.testing.assert_allclose(out[0], out[1], atol=1e-6)

    def test_deterministic(self):
        rng = np.random.RandomState(2)
        seq = rng.rand(2, 8, 8, 3).astype(np.float32)
        a = color_augment(seq.copy(), np.random.RandomState(5))
        b = color_augment(seq.copy(), np.random.RandomState(5))
        np.testing.assert_allclose(a, b)

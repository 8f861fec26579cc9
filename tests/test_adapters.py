"""Dataset-adapter parity details: intrinsics, crop mode, eval masks."""

import numpy as np
import pytest

from m4depth_tpu.data.datasets import (
    KittiRawAdapter,
    MidAirAdapter,
    TartanAirAdapter,
    get_adapter,
)


class TestMidAir:
    def test_default_intrinsics(self):
        a = MidAirAdapter()
        a.set_output_size((384, 384))
        f, c = a.intrinsics()
        np.testing.assert_allclose(f, [192.0, 192.0])
        np.testing.assert_allclose(c, [192.0, 192.0])

    def test_crop_mode_uses_square_intermediate(self):
        """Finetune crop: decode at a square of the long edge, crop to the
        target (dataloaders/midair.py:13-23,91-106)."""
        a = MidAirAdapter()
        a.set_output_size((256, 768), crop=True)
        assert a.intermediate_size == (768, 768)
        f, c = a.intrinsics()
        np.testing.assert_allclose(f, [384.0, 384.0])

    def test_crop_augment_shifts_principal_point(self):
        from m4depth_tpu.data.augment import crop_augment

        rng = np.random.RandomState(0)
        seq = {
            "RGB_im": rng.rand(2, 16, 16, 3).astype(np.float32),
            "depth": rng.rand(2, 16, 16, 1).astype(np.float32),
            "camera_c": np.array([8.0, 8.0], np.float32),
            "camera_f": np.array([8.0, 8.0], np.float32),
            "rot": np.zeros((2, 4), np.float32),
            "trans": np.zeros((2, 3), np.float32),
        }
        out = crop_augment(seq, np.random.RandomState(1), (8, 16))
        assert out["RGB_im"].shape == (2, 8, 16, 3)
        assert out["depth"].shape == (2, 8, 16, 1)
        # height crop (long edge is width): cy shifted by the offset
        assert out["camera_c"][0] == 8.0
        assert 0.0 <= out["camera_c"][1] <= 8.0


class TestKitti:
    def test_eval_crop_mask_garg(self):
        a = KittiRawAdapter()
        a.set_output_size((256, 768))
        mask = a.eval_crop_mask()
        assert mask.shape == (256, 768, 1)
        # Garg/Eigen crop bounds at 256x768: rows [104, 253), cols [27, 740)
        # (dataloaders/kitti.py:14-20)
        assert mask[104, 27, 0] == 1.0 and mask[252, 739, 0] == 1.0
        assert mask[103, 100, 0] == 0.0       # above the crop
        assert mask[200, 26, 0] == 0.0        # left of the crop
        assert mask[253, 100, 0] == 0.0       # below the crop
        frac = mask.mean()
        assert 0.4 < frac < 0.6

    def test_per_row_intrinsics_scaling(self):
        a = KittiRawAdapter()
        a.set_output_size((256, 768))
        # decode_row scales normalized intrinsics by the out size
        row = {"fx": 0.5, "fy": 1.0, "cx": 0.5, "cy": 0.5,
               "qw": 1.0, "qx": 0, "qy": 0, "qz": 0,
               "tx": 0, "ty": 0, "tz": 0.5, "id": 3}
        # no image on disk: check the math via the same formulas
        f = np.array([row["fx"] * 768, row["fy"] * 256], np.float32)
        c = np.array([row["cx"] * 768, row["cy"] * 256], np.float32)
        np.testing.assert_allclose(f, [384.0, 256.0])
        np.testing.assert_allclose(c, [384.0, 128.0])


class TestTartanAir:
    def test_intrinsics(self):
        a = TartanAirAdapter()
        a.set_output_size((384, 512))
        f, c = a.intrinsics()
        np.testing.assert_allclose(f, [256.0, 256.0])  # w/2, 2h/3
        np.testing.assert_allclose(c, [256.0, 192.0])

    def test_raw_depth_decode(self, tmp_path):
        from m4depth_tpu.data.decode import load_raw_float32_depth

        depth = np.random.RandomState(0).uniform(
            1, 50, (480, 640)).astype(np.float32)
        p = tmp_path / "d.raw"
        # TartanAir files may carry a header; the loader takes the tail
        blob = np.concatenate([np.zeros(16, np.float32), depth.ravel()])
        blob.tofile(str(p))
        out = load_raw_float32_depth(str(p), 480, 640)
        np.testing.assert_allclose(out[..., 0], depth)


class TestRegistry:
    def test_get_adapter(self):
        assert get_adapter("midair").depth_type == "map"
        assert get_adapter("kitti-raw").depth_type == "velodyne"
        assert get_adapter("tartanair").depth_type == "map"
        with pytest.raises(NotImplementedError):
            get_adapter("nope")

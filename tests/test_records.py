"""Record store: roundtrip fidelity + window parity with the CSV pipeline."""

import os

import numpy as np
import pytest

from m4depth_tpu.data.records import (
    RecordSequenceDataset,
    RecordStoreWriter,
    RecordTrajectoryReader,
    convert_csv_dataset,
)


def make_frames(rng, n, h=8, w=8):
    frames = []
    for i in range(n):
        frames.append({
            "RGB_im": rng.rand(h, w, 3).astype(np.float32),
            "depth": rng.uniform(1, 60, (h, w, 1)).astype(np.float32),
            "rot": np.array([1, 0, 0, 0], np.float32),
            "trans": np.array([0.05, 0, 0.4], np.float32),
            "camera_f": np.array([4.0, 4.0], np.float32),
            "camera_c": np.array([4.0, 4.0], np.float32),
            "new_traj": i == 0,
        })
    return frames


class TestRecordStore:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        frames = make_frames(rng, 5)
        writer = RecordStoreWriter(str(tmp_path / "store"), num_shards=2)
        writer.write_trajectory(frames, name="t0")
        writer.close()

        reader = RecordTrajectoryReader(str(tmp_path / "store"))
        assert len(reader) == 1
        assert reader.num_frames(0) == 5
        out = reader.read_frames(0, 1, 3)
        assert len(out) == 3
        # color quantized to uint8: 1/255 tolerance
        np.testing.assert_allclose(out[0]["RGB_im"], frames[1]["RGB_im"],
                                   atol=1 / 255.0 + 1e-6)
        # depth stored float16
        np.testing.assert_allclose(out[2]["depth"], frames[3]["depth"],
                                   rtol=1e-3)
        np.testing.assert_array_equal(out[0]["rot"], frames[1]["rot"])

    def test_multiple_trajectories_across_shards(self, tmp_path):
        rng = np.random.RandomState(1)
        writer = RecordStoreWriter(str(tmp_path / "store"), num_shards=2)
        for t in range(4):
            writer.write_trajectory(make_frames(rng, 6), name=f"t{t}")
        writer.close()
        reader = RecordTrajectoryReader(str(tmp_path / "store"))
        assert len(reader) == 4
        for ti in range(4):
            assert reader.num_frames(ti) == 6
            out = reader.read_frames(ti, 0, 6)
            assert len(out) == 6

    def test_convert_csv_dataset_end_to_end(self, tmp_path):
        """CSV manifests -> record store -> batches matches the live
        pipeline's decoded content."""
        cv2 = pytest.importorskip("cv2")
        from m4depth_tpu.data import SequenceDataset, get_adapter

        # build a tiny midair-style fixture
        db = tmp_path / "db"
        records = tmp_path / "records"
        rng = np.random.RandomState(0)
        os.makedirs(records / "t0", exist_ok=True)
        os.makedirs(db / "t0", exist_ok=True)
        lines = ["id\tcamera_l\tdisp\tqw\tqx\tqy\tqz\ttx\tty\ttz"]
        for i in range(6):
            img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(db / f"t0/c{i}.jpg"), img)
            depth = rng.uniform(5, 50, (16, 16)).astype(np.float32)
            cv2.imwrite(str(db / f"t0/d{i}.png"),
                        (512.0 / depth).astype(np.float16).view(np.uint16))
            lines.append(f"{i}\tt0/c{i}.jpg\tt0/d{i}.png\t1\t0\t0\t0"
                         "\t0.05\t0.01\t0.4")
        (records / "t0" / "traj.csv").write_text("\n".join(lines))

        adapter = get_adapter("midair")
        n = convert_csv_dataset(adapter, str(db), str(records),
                                str(tmp_path / "store"), num_shards=2,
                                num_workers=2, out_size=(16, 16))
        assert n == 1

        rec_ds = RecordSequenceDataset(
            str(tmp_path / "store"), usecase="train", db_seq_len=6,
            seq_len=6, batch_size=1, augment=False, num_workers=1)
        live_ds = SequenceDataset(
            get_adapter("midair"), str(db), str(records), usecase="train",
            db_seq_len=6, seq_len=6, batch_size=1, augment=False,
            out_size=(16, 16), num_workers=1)
        rb = next(rec_ds.batches(0))
        lb = next(live_ds.batches(0))
        np.testing.assert_allclose(rb["rgb"], lb["rgb"], atol=1 / 255.0 + 1e-6)
        np.testing.assert_allclose(rb["depth"], lb["depth"], rtol=2e-3)
        np.testing.assert_allclose(rb["rot"], lb["rot"])
        np.testing.assert_allclose(rb["camera_f"], lb["camera_f"])

    def test_windowed_dataset(self, tmp_path):
        rng = np.random.RandomState(2)
        writer = RecordStoreWriter(str(tmp_path / "store"), num_shards=1)
        for t in range(2):
            writer.write_trajectory(make_frames(rng, 10), name=f"t{t}")
        writer.close()

        ds = RecordSequenceDataset(str(tmp_path / "store"), usecase="train",
                                   db_seq_len=8, seq_len=4, batch_size=2,
                                   augment=False, num_workers=1)
        assert len(ds) == 1
        batch = next(ds.batches(0))
        assert batch["rgb"].shape == (2, 4, 8, 8, 3)
        assert batch["depth"].shape == (2, 4, 8, 8, 1)
        np.testing.assert_array_equal(
            batch["new_traj"], [[True, False, False, False]] * 2)


class TestRound2Fixes:
    def test_store_preserves_trajectory_breaks(self, tmp_path):
        """Mid-manifest trajectory breaks must survive the store and reset
        streaming-eval state (they used to be reconstructed as start==0)."""
        rng = np.random.RandomState(1)
        frames = make_frames(rng, 6)
        frames[3]["new_traj"] = True  # a break in the middle
        writer = RecordStoreWriter(str(tmp_path / "store"), num_shards=1)
        writer.write_trajectory(frames, name="t0")
        writer.close()

        ds = RecordSequenceDataset(str(tmp_path / "store"), usecase="eval",
                                   db_seq_len=None, num_workers=1)
        flags = [bool(b["new_traj"][0]) for b in ds.frames()]
        assert flags == [True, False, False, True, False, False]

    def test_frame_offsets_make_reads_random_access(self, tmp_path):
        rng = np.random.RandomState(2)
        frames = make_frames(rng, 7)
        writer = RecordStoreWriter(str(tmp_path / "store"), num_shards=1)
        writer.write_trajectory(frames, name="t0")
        writer.close()
        reader = RecordTrajectoryReader(str(tmp_path / "store"))
        meta = reader.trajectories[0]
        assert len(meta["frame_offsets"]) == 7
        # O(count) path must agree with the legacy scan path
        fast = reader.read_frames(0, 4, 2)
        meta_no_off = dict(meta)
        meta_no_off.pop("frame_offsets")
        reader.trajectories[0] = meta_no_off
        slow = reader.read_frames(0, 4, 2)
        for a, b in zip(fast, slow):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    def test_train_requires_db_seq_len(self, tmp_path):
        rng = np.random.RandomState(3)
        writer = RecordStoreWriter(str(tmp_path / "store"), num_shards=1)
        writer.write_trajectory(make_frames(rng, 4), name="t0")
        writer.close()
        with pytest.raises(ValueError, match="db_seq_len"):
            RecordSequenceDataset(str(tmp_path / "store"), usecase="train",
                                  db_seq_len=None)
        with pytest.raises(ValueError, match="db_seq_len"):
            RecordSequenceDataset(str(tmp_path / "store"), usecase="train",
                                  db_seq_len=2, seq_len=4)

    def test_store_resolution_overrides_adapter(self, tmp_path):
        """Opening a store must size the adapter to the STORED resolution:
        an eval_crop_mask sized by a stale out_size against differently-
        sized stored depth broadcast-crashed mid-evaluation."""
        from m4depth_tpu.data import get_adapter

        rng = np.random.RandomState(6)
        writer = RecordStoreWriter(str(tmp_path / "store"), num_shards=1)
        writer.write_trajectory(make_frames(rng, 4), name="t0")  # 8x8 frames
        writer.close()
        adapter = get_adapter("kitti-raw")
        adapter.set_output_size((256, 768))  # stale / mismatched
        ds = RecordSequenceDataset(str(tmp_path / "store"), adapter=adapter,
                                   usecase="eval", db_seq_len=4,
                                   augment=False, num_workers=1)
        assert tuple(adapter.out_size) == (8, 8)
        batch = next(ds.batches())  # masked multiply must not broadcast-fail
        assert batch["depth"].shape == (1, 4, 8, 8, 1)

    def test_store_matching_crop_adapter_untouched(self, tmp_path):
        """A crop adapter decodes at intermediate_size (the square long-edge
        box), which is what conversion stored — when that matches, the
        override must NOT fire (it used to reset crop=False via
        set_output_size's default, silently changing the train geometry)."""
        from m4depth_tpu.data import get_adapter

        rng = np.random.RandomState(8)
        writer = RecordStoreWriter(str(tmp_path / "store"), num_shards=1)
        writer.write_trajectory(make_frames(rng, 4), name="t0")  # 8x8 frames
        writer.close()
        adapter = get_adapter("midair")
        adapter.set_output_size((4, 8), crop=True)  # intermediate -> (8, 8)
        assert tuple(adapter.intermediate_size) == (8, 8)
        RecordSequenceDataset(str(tmp_path / "store"), adapter=adapter,
                              usecase="train", db_seq_len=4, seq_len=4,
                              augment=False, num_workers=1)
        assert adapter.crop is True
        assert tuple(adapter.out_size) == (4, 8)

    def test_store_mismatched_crop_adapter_fails_loudly(self, tmp_path):
        """When a crop adapter's decode size disagrees with the store, the
        intended crop at the stored size is unknowable — refuse instead of
        silently retraining uncropped."""
        from m4depth_tpu.data import get_adapter

        rng = np.random.RandomState(9)
        writer = RecordStoreWriter(str(tmp_path / "store"), num_shards=1)
        writer.write_trajectory(make_frames(rng, 4), name="t0")  # 8x8 frames
        writer.close()
        adapter = get_adapter("midair")
        adapter.set_output_size((256, 768), crop=True)
        with pytest.raises(ValueError, match="crop=True"):
            RecordSequenceDataset(str(tmp_path / "store"), adapter=adapter,
                                  usecase="train", db_seq_len=4, seq_len=4,
                                  augment=False, num_workers=1)

    def test_windowed_store_frames_unrolled(self, tmp_path):
        """Record-store frames() unrolls windowed batches to single frames
        (interface parity with SequenceDataset.frames)."""
        rng = np.random.RandomState(7)
        writer = RecordStoreWriter(str(tmp_path / "store"), num_shards=1)
        writer.write_trajectory(make_frames(rng, 8), name="t0")
        writer.close()
        ds = RecordSequenceDataset(str(tmp_path / "store"), usecase="eval",
                                   db_seq_len=4, augment=False,
                                   num_workers=1)
        frames = list(ds.frames())
        assert len(frames) == 8  # 2 windows x 4 frames
        assert frames[0]["rgb"].shape == (1, 8, 8, 3)
        assert frames[0]["new_traj"].shape == (1,)

    def test_eval_crop_applied_at_read(self, tmp_path):
        """KITTI stores are written with train decoding; the Garg/Eigen crop
        must still gate eval depth when reading."""
        rng = np.random.RandomState(4)

        class CroppingAdapter:
            depth_type = "velodyne"

            def eval_crop_mask(self):
                m = np.zeros((8, 8, 1), np.float32)
                m[2:6, 1:7] = 1.0
                return m

        writer = RecordStoreWriter(str(tmp_path / "store"), num_shards=1)
        writer.write_trajectory(make_frames(rng, 2), name="t0")
        writer.close()
        ds = RecordSequenceDataset(str(tmp_path / "store"),
                                   adapter=CroppingAdapter(), usecase="eval",
                                   db_seq_len=2, augment=False, num_workers=1)
        batch = next(ds.batches())
        depth = batch["depth"]
        assert np.all(depth[:, :, :2] == 0) and np.all(depth[:, :, 6:] == 0)
        assert np.any(depth[:, :, 2:6, 1:7] > 0)

"""JointSampler: 50/50 stochastic mixing with stream restart."""

import numpy as np

from m4depth_tpu.cli.finetune_kitti import JointSampler


class FakeDataset:
    def __init__(self, tag, n, batch_size=2):
        self.tag = tag
        self.n = n
        self.batch_size = batch_size

    def __len__(self):
        return self.n

    def batches(self, epoch=0):
        for i in range(self.n):
            yield {"tag": self.tag, "i": i, "epoch": epoch}


class TestJointSampler:
    def test_length_convention(self):
        js = JointSampler(FakeDataset("a", 5), FakeDataset("b", 50))
        assert len(js) == 10  # 2x the first (KITTI) stream

    def test_mixes_and_restarts(self):
        js = JointSampler(FakeDataset("a", 10), FakeDataset("b", 10), seed=0)
        batches = list(js.batches(0))
        assert len(batches) == 20
        tags = [b["tag"] for b in batches]
        assert "a" in tags and "b" in tags
        # roughly balanced mixing
        assert 4 <= tags.count("a") <= 16

        # long run forces both streams to restart without raising
        js2 = JointSampler(FakeDataset("a", 1), FakeDataset("b", 1), seed=1)
        batches = list(js2.batches(0))
        assert len(batches) == 2

    def test_restart_epochs_disjoint_from_genuine_epochs(self):
        """Restarted streams must never reuse a genuine epoch's shuffle seed
        (the round-2 ``epoch + 1000 + n`` scheme collided: restart at epoch 3
        with n=1000 equals genuine epoch 1003)."""
        # len == 2*2 == 4 draws from 2+1 == 3 available batches: at least one
        # stream is guaranteed to restart
        js = JointSampler(FakeDataset("a", 2), FakeDataset("b", 1), seed=0)
        genuine = range(0, 100_000)
        for epoch in (0, 3, 1003):
            restart_epochs = {
                b["epoch"] for b in js.batches(epoch)
                if b["epoch"] != epoch}
            assert restart_epochs, "short streams must have restarted"
            for r in restart_epochs:
                assert r >= js.RESTART_STRIDE, (
                    f"restart epoch {r} collides with the genuine range")
                assert r not in genuine

    def test_restarts_are_deterministic(self):
        js = JointSampler(FakeDataset("a", 1), FakeDataset("b", 1), seed=4)
        runs = [[(b["tag"], b["epoch"]) for b in js.batches(7)]
                for _ in range(2)]
        assert runs[0] == runs[1]

    def test_deterministic_per_epoch(self):
        js = JointSampler(FakeDataset("a", 3), FakeDataset("b", 3), seed=2)
        t1 = [b["tag"] for b in js.batches(0)]
        t2 = [b["tag"] for b in js.batches(0)]
        assert t1 == t2
        t3 = [b["tag"] for b in js.batches(1)]
        assert len(t3) == len(t1)

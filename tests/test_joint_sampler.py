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

    def test_deterministic_per_epoch(self):
        js = JointSampler(FakeDataset("a", 3), FakeDataset("b", 3), seed=2)
        t1 = [b["tag"] for b in js.batches(0)]
        t2 = [b["tag"] for b in js.batches(0)]
        assert t1 == t2
        t3 = [b["tag"] for b in js.batches(1)]
        assert len(t3) == len(t1)

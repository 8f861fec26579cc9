"""KITTI finetuning: joint 50/50 KITTI + Mid-Air sampling with velodyne loss.

Parity reference: finetune-kitti.py:13-88 — KITTI windows (db_seq_len 4) and
Mid-Air windows (db_seq_len 8) cropped to the KITTI output size, sampled
50/50, depth_type "velodyne", +20k steps from the promoted Mid-Air weights.

Usage:
  python -m m4depth_tpu.cli.finetune_kitti --records_path=data \
      --ckpt_dir=ckpt/kitti-finetune
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Iterator

import numpy as np


class JointSampler:
    """50/50 stochastic mix of two batch streams.

    Parity: tf.data.Dataset.sample_from_datasets(weights=[0.5, 0.5])
    (finetune-kitti.py:54). Length convention: 2x the KITTI epoch
    (finetune-kitti.py:56).
    """

    def __init__(self, ds_a, ds_b, seed: int = 42):
        self.ds_a = ds_a
        self.ds_b = ds_b
        self.seed = seed

    def __len__(self) -> int:
        return 2 * len(self.ds_a)

    @property
    def batch_size(self):
        return self.ds_a.batch_size

    # Restarted streams draw their shuffle epoch from a namespace disjoint
    # from genuine epochs: (epoch+1) * RESTART_STRIDE + restart_count can
    # never equal a real epoch index (epochs stay far below the stride), so
    # the (seed, epoch, index) determinism contract holds — the round-2
    # ``epoch + 1000 + n`` scheme could collide (epoch 1003 vs epoch 3 at
    # n=1000).
    RESTART_STRIDE = 1_000_003

    def batches(self, epoch: int = 0) -> Iterator[dict]:
        rng = np.random.RandomState(self.seed + epoch)
        it_a = self.ds_a.batches(epoch)
        it_b = self.ds_b.batches(epoch)
        restarts = 0
        n = 0
        while n < len(self):
            use_a = rng.uniform() < 0.5
            it = it_a if use_a else it_b
            try:
                yield next(it)
            except StopIteration:
                # restart the exhausted stream (datasets .repeat() semantics)
                restart_epoch = ((epoch + 1) * self.RESTART_STRIDE + restarts)
                restarts += 1
                if use_a:
                    it_a = self.ds_a.batches(restart_epoch)
                    yield next(it_a)
                else:
                    it_b = self.ds_b.batches(restart_epoch)
                    yield next(it_b)
            n += 1


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    from m4depth_tpu.cli.options import (
        build_parser,
        dataset_locations,
        finetune_total_steps,
        model_config_from_args,
        train_config_from_args,
    )

    build_parser(parser)
    cmd, unknown = parser.parse_known_args(argv)
    if unknown:
        print(f"WARNING: ignoring unrecognized arguments: {unknown}",
              flush=True)
    db_paths = dataset_locations(cmd)

    from m4depth_tpu.data import SequenceDataset, get_adapter
    from m4depth_tpu.models import M4Depth
    from m4depth_tpu.train.loop import fit

    kitti = SequenceDataset(
        get_adapter("kitti-raw"), db_paths.get("kitti-raw", ""),
        os.path.join(cmd.records_path, "kitti-raw-filtered", "train_data"),
        usecase="finetune", db_seq_len=4, seq_len=4,
        batch_size=cmd.batch_size, augment=True,
        seed=cmd.seed, num_workers=cmd.num_workers)
    midair = SequenceDataset(
        get_adapter("midair"), db_paths.get("midair", ""),
        os.path.join(cmd.records_path, "midair", "train_data"),
        usecase="finetune", db_seq_len=8, seq_len=4,
        batch_size=cmd.batch_size, augment=True,
        out_size=kitti.adapter.out_size, crop=True,
        seed=cmd.seed, num_workers=cmd.num_workers)

    joint = JointSampler(kitti, midair, seed=cmd.seed)

    cfg = model_config_from_args(cmd, depth_type="velodyne")
    model = M4Depth(cfg)
    tcfg = train_config_from_args(cmd)

    total = finetune_total_steps(cmd.ckpt_dir, cmd.finetune_steps,
                                 len(joint))

    validation_fn = None
    if cmd.enable_validation:
        from m4depth_tpu.cli.main import (
            SubprocessValidator,
            make_validation_fn,
        )

        # honor --validation_mode like cli/main.py: 'subprocess' keeps the
        # full KITTI val pass off the training chip
        if cmd.validation_mode == "subprocess":
            validation_fn = SubprocessValidator(cmd)
        else:
            validation_fn = make_validation_fn(cmd, model, db_paths)

    fit(model, joint, tcfg, total_steps=total, resume=True,
        validation_fn=validation_fn)
    return 0


if __name__ == "__main__":
    sys.exit(main())

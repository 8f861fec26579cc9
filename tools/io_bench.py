#!/usr/bin/env python
"""Input-pipeline throughput: JPEG/PNG decode-per-epoch vs record-store mmap.

Generates a Mid-Air-shaped synthetic dataset on disk (JPEG RGB + fp16
disparity PNGs at 384^2), then measures training-batch throughput through
both pipelines (the legacy TFRecord-DB capability, protobuf_db.py:287-358,
is the reference for the store). CPU-only; results recorded in
DEVELOPMENT.md.

Usage: python tools/io_bench.py [--trajs 4] [--frames 32] [--size 384]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_db(root, trajs, frames, size):
    import cv2

    db = os.path.join(root, "db")
    records = os.path.join(root, "records")
    rng = np.random.RandomState(0)
    for t in range(trajs):
        os.makedirs(os.path.join(records, f"traj_{t}"), exist_ok=True)
        os.makedirs(os.path.join(db, f"traj_{t}"), exist_ok=True)
        lines = ["id\tcamera_l\tdisp\tqw\tqx\tqy\tqz\ttx\tty\ttz"]
        for i in range(frames):
            img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
            img_rel = f"traj_{t}/c_{i}.jpg"
            cv2.imwrite(os.path.join(db, img_rel), img)
            depth = rng.uniform(5, 50, (size, size)).astype(np.float32)
            disp16 = (512.0 / depth).astype(np.float16)
            d_rel = f"traj_{t}/d_{i}.png"
            cv2.imwrite(os.path.join(db, d_rel), disp16.view(np.uint16))
            lines.append(
                f"{i}\t{img_rel}\t{d_rel}\t1\t0\t0\t0\t0.05\t0.01\t0.4")
        with open(os.path.join(records, f"traj_{t}", "traj.csv"), "w") as fh:
            fh.write("\n".join(lines))
    return db, records


def throughput(ds, epochs=3):
    # one warmup epoch (page cache, worker spin-up), then timed epochs
    n = 0
    for _ in ds.batches(0):
        n += 1
    t0 = time.perf_counter()
    total = 0
    for e in range(1, epochs + 1):
        for batch in ds.batches(e):
            total += batch["rgb"].shape[0]
    dt = time.perf_counter() - t0
    return total / dt, n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trajs", type=int, default=4)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=384)
    p.add_argument("--batch", type=int, default=3)
    p.add_argument("--seq_len", type=int, default=4)
    p.add_argument("--db_seq_len", type=int, default=8)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--no_augment", action="store_true",
                   help="isolate decode-vs-mmap (augmentation cost is "
                        "identical in both pipelines)")
    a = p.parse_args()

    from m4depth_tpu.data import SequenceDataset, get_adapter
    from m4depth_tpu.data.records import (
        RecordSequenceDataset,
        convert_csv_dataset,
    )

    root = tempfile.mkdtemp(prefix="m4depth_io_bench_")
    try:
        db, records = make_db(root, a.trajs, a.frames, a.size)
        adapter = get_adapter("midair")
        adapter.set_output_size((a.size, a.size))

        decode_ds = SequenceDataset(
            adapter, db_path=db, records_path=records, usecase="train",
            db_seq_len=a.db_seq_len, seq_len=a.seq_len, batch_size=a.batch,
            augment=not a.no_augment, num_workers=a.workers)
        dec_rate, nb = throughput(decode_ds)

        store = os.path.join(root, "store")
        t0 = time.perf_counter()
        convert_csv_dataset(adapter, db, records, out_dir=store)
        conv_s = time.perf_counter() - t0

        mmap_ds = RecordSequenceDataset(
            store, adapter=adapter, usecase="train", db_seq_len=a.db_seq_len,
            seq_len=a.seq_len, batch_size=a.batch, augment=not a.no_augment,
            num_workers=a.workers)
        mm_rate, _ = throughput(mmap_ds)

        print(json.dumps({
            "config": f"{a.trajs}x{a.frames} frames @ {a.size}^2, "
                      f"batch {a.batch}, seq {a.seq_len}, "
                      f"{a.workers} workers, {nb} batches/epoch",
            "decode_windows_per_s": round(dec_rate, 2),
            "record_store_windows_per_s": round(mm_rate, 2),
            "speedup": round(mm_rate / dec_rate, 2),
            "one_off_convert_s": round(conv_s, 2),
        }, indent=1))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Measure the TF reference's streaming throughput on CPU — the measured
anchor for bench.py's ``vs_baseline`` multiple.

The reference claims only qualitative "real-time" inference on "most GPUs"
(/root/reference/README.md:15-16); BASELINE.md interprets that as 30 fps.
This tool produces a *measured* number for the reference source itself,
clearly labeled TF-CPU: the reference's own eval path cannot run on this
host's TPU (its native op is CUDA-only, cuda_backproject/backproject_op.cc),
so a CPU figure is a lower bound on the reference's GPU speed but an honest,
reproducible anchor alongside the assumed 30 fps.

Drives the reference's own encoder + level layers frame-at-a-time in eval
mode (temporal state in the reference's level variables,
m4depth_network.py:153-214) via m4depth_tpu.interop — the same machinery the
TF-parity tests use. ``--compiled`` wraps the per-frame step in
``tf.function`` (the reference enables XLA auto-jit at eval, main.py:23-24).

Usage:
  python tools/ref_baseline.py [--size 384] [--levels 6] [--frames 20]
      [--warmup 3] [--compiled]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--levels", type=int, default=6)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--compiled", action="store_true",
                    help="wrap the frame step in tf.function (the reference "
                         "runs eval under XLA auto-jit, main.py:23-24)")
    args = ap.parse_args()

    from m4depth_tpu.interop.tf_ref import load_reference

    ref = load_reference()
    tf = ref.tf

    h = w = args.size
    model = ref.network.M4Depth(nbre_levels=args.levels, is_training=False)
    levels = model.d_estimator.levels
    L = len(levels)
    rng = np.random.RandomState(0)
    rgb = rng.rand(1, h, w, 3).astype(np.float32)
    rot = np.array([[1.0, 0, 0, 0]], np.float32)
    trans = np.array([[0.05, 0.01, 0.4]], np.float32)
    f = np.full((1, 2), w / 2.0, np.float32)
    c = np.full((1, 2), w / 2.0, np.float32)

    def frame_step(rgb_t, rot_t, trans_t, new_traj):
        f_pyr = model.encoder(rgb_t)
        d_curr = []
        cnter = float(L)
        for l, (f_maps, level) in enumerate(zip(f_pyr[::-1], levels[::-1])):
            local_cam = {"f": f / 2.0 ** cnter, "c": c / 2.0 ** cnter}
            d_est = dict(d_curr[-1]) if d_curr else None
            out = level(f_maps, prev_l_est=d_est, rot=rot_t, trans=trans_t,
                        camera=local_cam, new_traj=new_traj,
                        prev_f_maps=None, prev_t_depth=None)
            d_curr.append(out)
            cnter -= 1.0
        return d_curr[-1]["depth"]

    # build variables on an eager first-frame call
    depth = frame_step(tf.constant(rgb), tf.constant(rot),
                       tf.constant(trans), np.array([True]))
    step = frame_step
    if args.compiled:
        step = tf.function(
            lambda r_, q_, t_: frame_step(r_, q_, t_, np.array([False])))

    for _ in range(args.warmup):
        if args.compiled:
            depth = step(tf.constant(rgb), tf.constant(rot),
                         tf.constant(trans))
        else:
            depth = step(tf.constant(rgb), tf.constant(rot),
                         tf.constant(trans), np.array([False]))
    np.asarray(depth)

    times = []
    for _ in range(args.frames):
        t0 = time.perf_counter()
        if args.compiled:
            depth = step(tf.constant(rgb), tf.constant(rot),
                         tf.constant(trans))
        else:
            depth = step(tf.constant(rgb), tf.constant(rot),
                         tf.constant(trans), np.array([False]))
        np.asarray(depth)  # force completion
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    print(json.dumps({
        "metric": "reference_stream_fps_tf_cpu",
        "size": args.size,
        "levels": args.levels,
        "compiled": bool(args.compiled),
        "fps_median": round(float(1.0 / np.median(arr)), 3),
        "fps_mean": round(float((1.0 / arr).mean()), 3),
        "ms_median": round(float(np.median(arr) * 1e3), 2),
        "n_frames": args.frames,
    }))


if __name__ == "__main__":
    main()

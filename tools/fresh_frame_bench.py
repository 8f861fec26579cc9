#!/usr/bin/env python
"""Fresh-frame streaming fps: per-frame h2d transfers included (real TPU).

Measures the online-predict use case (reference main.py:163-172): every frame
is a DISTINCT host array that must cross host->device before compute. Two
loops are timed:

  * serial    — the naive per-frame [device_put, step, fetch] sequence;
  * pipelined — FreshFrameStream double-buffering (frame t+1's transfer
    dispatched before frame t's step result is consumed).

Bounded run: the tunneled transport leaks host memory per distinct h2d
transfer (DEVELOPMENT.md "Tunnel transport leaks"), so --frames stays small
(default 200 ≈ 350 MB of leak at 384^2).

Usage: python tools/fresh_frame_bench.py [--frames 200] [--size 384]
       [--consume every|last]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/m4depth_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--size", type=int, default=384)
    p.add_argument("--levels", type=int, default=6)
    p.add_argument("--consume", choices=("every", "last"), default="every",
                   help="'every': np.asarray each depth (the online predict "
                        "pattern); 'last': only sync at the end")
    a = p.parse_args()

    from m4depth_tpu.config import ModelConfig
    from m4depth_tpu.geometry import Camera
    from m4depth_tpu.models import M4Depth, init_state
    from m4depth_tpu.parallel import FreshFrameStream

    cfg = ModelConfig(num_levels=a.levels, compute_dtype="bfloat16")
    model = M4Depth(cfg)
    b, h, w = 1, a.size, a.size
    rng = np.random.RandomState(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.rand(b, 2, 64, 64, 3).astype(np.float32)),
        jnp.tile(jnp.array([[[1.0, 0, 0, 0]]], jnp.float32), (b, 2, 1)),
        jnp.tile(jnp.array([[[0.05, 0.0, 0.4]]], jnp.float32), (b, 2, 1)),
        Camera(f=jnp.full((b, 2), 32.0), c=jnp.full((b, 2), 32.0)))

    rot = np.tile(np.array([[1.0, 0.001, -0.002, 0.0005]], np.float32),
                  (b, 1))
    trans = np.tile(np.array([[0.05, 0.02, 0.4]], np.float32), (b, 1))
    cam = Camera(f=np.full((b, 2), h / 2.0, np.float32),
                 c=np.full((b, 2), h / 2.0, np.float32))
    go = np.zeros((b,), bool)

    # distinct host frames, pre-generated outside the timed loop. A cycled
    # pool of 32 is enough that the runtime cannot reuse a live buffer
    # (leak-bounding: 32 distinct arrays regardless of --frames would NOT
    # exercise per-frame transfers — the tunnel dedups only identical array
    # objects, not equal contents, so cycling distinct objects still issues
    # one real h2d per frame; verified by RSS growth)
    frames = [rng.rand(b, h, w, 3).astype(np.float32)
              for _ in range(min(a.frames, 32))]

    def frame(i):
        return frames[i % len(frames)]

    @jax.jit
    def step(params, state, rgb, rot, trans, f, c, new_traj):
        return model.apply(params, state, rgb, rot, trans, Camera(f, c),
                           new_traj, method=M4Depth.step)

    # ---- warmup / compile
    state = init_state(cfg, b, h, w)
    st, d = step(params, state, jnp.asarray(frame(0)), rot, trans,
                 cam.f, cam.c, np.ones((b,), bool))
    np.asarray(d)

    # ---- serial loop
    state = init_state(cfg, b, h, w)
    t0 = time.perf_counter()
    for i in range(a.frames):
        dev = jax.device_put((frame(i), rot, trans, cam, go))
        state, d = step(params, state, dev[0], dev[1], dev[2],
                        dev[3].f, dev[3].c, dev[4])
        if a.consume == "every":
            np.asarray(d)
    np.asarray(d)
    serial = time.perf_counter() - t0

    # ---- pipelined loop
    sess = FreshFrameStream(model, params, init_state(cfg, b, h, w))
    t1 = time.perf_counter()
    for i in range(a.frames):
        d = sess.push(frame(i), rot, trans, cam, go)
        if d is not None and a.consume == "every":
            np.asarray(d)
    np.asarray(sess.flush())
    piped = time.perf_counter() - t1

    print(f"serial:    {a.frames / serial:7.2f} fps "
          f"({1e3 * serial / a.frames:.3f} ms/frame)")
    print(f"pipelined: {a.frames / piped:7.2f} fps "
          f"({1e3 * piped / a.frames:.3f} ms/frame)  consume={a.consume} "
          f"size={a.size} frames={a.frames}")


if __name__ == "__main__":
    main()

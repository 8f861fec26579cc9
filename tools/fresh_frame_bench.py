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
       [--consume every|last] [--variant serial|pipelined|u8|delayed|
        kblock|all]

Measured findings (DEVELOPMENT.md "Fresh-frame serving through the
tunnel"): every variant is transport-latency bound at 10-22 fps on the
tunneled rig — a device_put issued while steps are in flight drains the
dispatch pipeline (~40-140 ms) — so the pipelined overlap cannot be
demonstrated here; on a host-attached TPU the measured 3 ms DMA rides
under the 4.9 ms step.
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
    p.add_argument("--variant", default="all",
                   choices=("serial", "pipelined", "u8", "delayed",
                            "kblock", "all"),
                   help="additional loop shapes from the DEVELOPMENT.md "
                        "matrix: 'u8' = uint8 frames cast on device; "
                        "'delayed' = consume depth one frame late; "
                        "'kblock' = 16 puts then 16 steps per block")
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

    @jax.jit
    def step_u8(params, state, rgb_u8, rot, trans, f, c, new_traj):
        rgb = rgb_u8.astype(jnp.float32) / np.float32(255.0)
        return model.apply(params, state, rgb, rot, trans, Camera(f, c),
                           new_traj, method=M4Depth.step)

    # ---- warmup / compile (both step signatures)
    state = init_state(cfg, b, h, w)
    st, d = step(params, state, jnp.asarray(frame(0)), rot, trans,
                 cam.f, cam.c, np.ones((b,), bool))
    np.asarray(d)
    f0u8 = (frame(0) * 255).astype(np.uint8)
    st, d = step_u8(params, state, jnp.asarray(f0u8), rot, trans,
                    cam.f, cam.c, np.ones((b,), bool))
    np.asarray(d)

    def run_serial():
        state = init_state(cfg, b, h, w)
        d = None
        t0 = time.perf_counter()
        for i in range(a.frames):
            dev = jax.device_put((frame(i), rot, trans, cam, go))
            state, d = step(params, state, dev[0], dev[1], dev[2],
                            dev[3].f, dev[3].c, dev[4])
            if a.consume == "every":
                np.asarray(d)
        np.asarray(d)
        return time.perf_counter() - t0

    def run_pipelined():
        sess = FreshFrameStream(model, params, init_state(cfg, b, h, w))
        t1 = time.perf_counter()
        for i in range(a.frames):
            d = sess.push(frame(i), rot, trans, cam, go)
            if d is not None and a.consume == "every":
                np.asarray(d)
        np.asarray(sess.flush())
        return time.perf_counter() - t1

    def run_u8():
        u8 = [(f * 255).astype(np.uint8) for f in frames]
        state = init_state(cfg, b, h, w)
        d = None
        t0 = time.perf_counter()
        for i in range(a.frames):
            dev = jax.device_put(u8[i % len(u8)])
            state, d = step_u8(params, state, dev, rot, trans,
                               cam.f, cam.c, go)
            if a.consume == "every":
                np.asarray(d)
        np.asarray(d)
        return time.perf_counter() - t0

    def run_delayed():
        # consume frame i's depth only after dispatching frame i+1's step,
        # giving the runtime one step of transfer/compute slack
        state = init_state(cfg, b, h, w)
        prev = None
        t0 = time.perf_counter()
        for i in range(a.frames):
            dev = jax.device_put(frame(i))
            state, d = step(params, state, dev, rot, trans,
                            cam.f, cam.c, go)
            if prev is not None and a.consume == "every":
                np.asarray(prev)
            prev = d
        np.asarray(prev)
        return time.perf_counter() - t0

    def run_kblock(K=16):
        # burst K distinct puts, then K steps: amortises whatever per-put
        # pipeline drain the transport imposes across a block
        state = init_state(cfg, b, h, w)
        d = None
        t0 = time.perf_counter()
        for blk in range(0, a.frames, K):
            ks = range(blk, min(blk + K, a.frames))
            devs = [jax.device_put(frame(i)) for i in ks]
            for dev in devs:
                state, d = step(params, state, dev, rot, trans,
                                cam.f, cam.c, go)
            if a.consume == "every":
                np.asarray(d)
        np.asarray(d)
        return time.perf_counter() - t0

    runners = {"serial": run_serial, "pipelined": run_pipelined,
               "u8": run_u8, "delayed": run_delayed, "kblock": run_kblock}
    names = list(runners) if a.variant == "all" else [a.variant]
    for name in names:
        dt = runners[name]()
        print(f"{name + ':':<11}{a.frames / dt:7.2f} fps "
              f"({1e3 * dt / a.frames:.3f} ms/frame)  consume={a.consume} "
              f"size={a.size} frames={a.frames}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-fusion profile of the streaming inference step on the real TPU.

Runs the bench.py flagship config under jax.profiler.trace, parses the
chrome-trace JSON, and prints the aggregated on-device cost per XLA op,
sorted. Use this to decide where DSCV/SNCV/conv time actually goes.

Usage: python tools/profile_stream.py [--size 384] [--levels 6] [--steps 30]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/m4depth_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def aggregate_trace(logdir: str, steps: int):
    """Sum ph=='X' event durations per op name across the trace."""
    paths = glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace found under {logdir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    per_op = defaultdict(float)
    per_op_count = defaultdict(int)
    # keep only events on TPU core tracks (pid names containing 'TPU')
    tpu_pids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            if "TPU" in ev.get("args", {}).get("name", ""):
                tpu_pids.add(ev["pid"])
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        name = ev.get("name", "?")
        per_op[name] += ev.get("dur", 0.0)
        per_op_count[name] += 1
    return {k: (v / steps, per_op_count[k]) for k, v in per_op.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=384)
    p.add_argument("--levels", type=int, default=6)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default="/tmp/m4depth_profile")
    a = p.parse_args()

    from m4depth_tpu.config import ModelConfig
    from m4depth_tpu.geometry import Camera
    from m4depth_tpu.models import M4Depth, init_state

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

    @jax.jit
    def step(params, state, rgb, rot, trans, f, c, new_traj):
        return model.apply(params, state, rgb, rot, trans, Camera(f, c),
                           new_traj, method=M4Depth.step)

    state = init_state(cfg, b, h, w)
    rgb = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    rot = jnp.array([[1.0, 0.001, -0.002, 0.0005]], jnp.float32)
    trans = jnp.array([[0.05, 0.02, 0.4]], jnp.float32)
    f = jnp.full((b, 2), h / 2.0)
    c = jnp.full((b, 2), h / 2.0)
    go = jnp.zeros((b,), bool)

    state, depth = step(params, state, rgb, rot, trans, f, c,
                        jnp.ones((b,), bool))
    np.asarray(depth)
    for _ in range(5):
        state, depth = step(params, state, rgb, rot, trans, f, c, go)
    np.asarray(depth)

    with jax.profiler.trace(a.logdir):
        for _ in range(a.steps):
            state, depth = step(params, state, rgb, rot, trans, f, c, go)
        np.asarray(depth)

    per_op = aggregate_trace(a.logdir, a.steps)
    total = sum(v for v, _ in per_op.values())
    print(f"total device time/step: {total:.1f} us "
          f"({1e6 / max(total, 1e-9):.1f} fps-equivalent)")
    print(f"{'us/step':>10}  {'%':>5}  {'n':>4}  op")
    for name, (us, cnt) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:a.top]:
        print(f"{us:10.1f}  {100 * us / total:5.1f}  {cnt:4d}  {name[:110]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Quick model-level fps benchmark with config overrides (real TPU).

Usage: python tools/fps.py [--dscv_impl split] [--sncv_impl xla] [--size 384]
       [--profile]  (adds a per-component breakdown via jax.profiler)
"""

import argparse
import functools
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
    p.add_argument("--dscv_impl", default="rows")
    p.add_argument("--sncv_impl", default="xla")
    p.add_argument("--chunk_bytes", type=int, default=30 << 20)
    p.add_argument("--row_group", type=int, default=2,
                   help="rows impl: y-shifts per fetched row (divides 2r+2)")
    p.add_argument("--x_window", type=int, default=5,
                   help="rows impl: direction-narrowed fetch box width "
                        "(0=off; exact only for steep epipolar fields "
                        "unless --xw_dual). Default 5 = shipped config")
    p.add_argument("--xw_dual", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="rows impl: dual-operand narrow fetch (exact for "
                        "all motions at x_window >= row_group+3). Default "
                        "on = shipped config; --no-xw_dual for the "
                        "single-operand steep-field variant")
    p.add_argument("--trans", default="0.05,0.02,0.4",
                   help="camera translation (affects the epipolar field "
                        "the DSCV fetches along; e.g. 0,0.2,0.02 is a "
                        "near-vertical field for x_window measurements)")
    p.add_argument("--size", type=int, default=384)
    p.add_argument("--height", type=int, default=0,
                   help="override --size for non-square geometries "
                        "(e.g. KITTI 256x768)")
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--levels", type=int, default=6)
    p.add_argument("--n", type=int, default=200)
    p.add_argument("--profile", action="store_true")
    p.add_argument("--para_direct", action="store_true")
    p.add_argument("--xla_opt", action="append", default=[],
                   help="key=value TPU compiler option (passed per-jit via "
                        "compiler_options — client XLA_FLAGS can't carry "
                        "TPU flags through the tunnel)")
    a = p.parse_args()
    copts = dict(kv.split("=", 1) for kv in a.xla_opt) or None

    from m4depth_tpu.config import ModelConfig
    from m4depth_tpu.geometry import Camera
    from m4depth_tpu.models import M4Depth, init_state

    cfg = ModelConfig(num_levels=a.levels, compute_dtype="bfloat16",
                      dscv_impl=a.dscv_impl, sncv_impl=a.sncv_impl,
                      dscv_chunk_bytes=a.chunk_bytes,
                      dscv_row_group=a.row_group,
                      dscv_x_window=a.x_window,
                      dscv_xw_dual=a.xw_dual,
                      dscv_para_direct=a.para_direct)
    model = M4Depth(cfg)
    b = a.batch
    h = a.height or a.size
    w = a.width or a.size
    rng = np.random.RandomState(0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.rand(b, 2, 64, 64, 3).astype(np.float32)),
        jnp.tile(jnp.array([[[1.0, 0, 0, 0]]], jnp.float32), (b, 2, 1)),
        jnp.tile(jnp.array([[[0.05, 0.0, 0.4]]], jnp.float32), (b, 2, 1)),
        Camera(f=jnp.full((b, 2), 32.0), c=jnp.full((b, 2), 32.0)))

    @functools.partial(jax.jit, compiler_options=copts)
    def step(params, state, rgb, rot, trans, f, c, new_traj):
        return model.apply(params, state, rgb, rot, trans, Camera(f, c),
                           new_traj, method=M4Depth.step)

    state = init_state(cfg, b, h, w)
    rgb = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    rot = jnp.tile(jnp.array([[1.0, 0.001, -0.002, 0.0005]], jnp.float32),
                   (b, 1))
    tvec = [float(x) for x in a.trans.split(",")]
    trans = jnp.tile(jnp.array([tvec], jnp.float32), (b, 1))
    f = jnp.full((b, 2), min(h, w) / 2.0)
    c = jnp.tile(jnp.array([[w / 2.0, h / 2.0]], jnp.float32), (b, 1))
    go = jnp.zeros((b,), bool)

    state, depth = step(params, state, rgb, rot, trans, f, c,
                        jnp.ones((b,), bool))
    np.asarray(depth)
    for _ in range(10):
        state, depth = step(params, state, rgb, rot, trans, f, c, go)
    np.asarray(depth)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(a.n):
            state, depth = step(params, state, rgb, rot, trans, f, c, go)
        np.asarray(depth)
        best = min(best, time.perf_counter() - t0)
    print(f"fps={a.n * b / best:.2f}  ms/step={1e3 * best / a.n:.3f}  "
          f"batch={b} dscv={a.dscv_impl} sncv={a.sncv_impl} size={h}x{w}")

    if a.profile:
        import glob
        import gzip
        import json as jsonlib
        import re
        from collections import defaultdict

        hlo = step.lower(params, state, rgb, rot, trans, f, c,
                         go).compile().as_text()
        with jax.profiler.trace("/tmp/m4depth_fps_prof"):
            for _ in range(30):
                state, depth = step(params, state, rgb, rot, trans, f, c, go)
            np.asarray(depth)
        meta = {}
        for m in re.finditer(
                r'%?([\w.-]+) = ([^\s]+)[^\n]*?metadata={op_name="([^"]*)" '
                r'source_file="([^"]*)" source_line=(\d+)', hlo):
            meta[m.group(1)] = (m.group(2)[:48], m.group(3),
                                os.path.basename(m.group(4)), int(m.group(5)))
        paths = glob.glob(
            "/tmp/m4depth_fps_prof/plugins/profile/*/*.trace.json.gz")
        with gzip.open(max(paths, key=os.path.getmtime), "rt") as fh:
            trace = jsonlib.load(fh)
        # the device lane: prefer the pid whose process_name metadata says
        # /device: (host lanes carry python-frame events that can dominate a
        # duration-based pick); fall back to most XLA-op time
        device_pid = None
        by_pid = defaultdict(float)
        for ev in trace["traceEvents"]:
            if (ev.get("ph") == "M" and ev.get("name") == "process_name"
                    and "/device:" in str(ev.get("args", {}).get("name"))):
                device_pid = ev.get("pid")
            if ev.get("ph") == "X" and not ev.get("name", "").startswith(
                    "jit_"):
                by_pid[ev.get("pid")] += ev.get("dur", 0.0)
        if device_pid is None:
            device_pid = max(by_pid, key=by_pid.get) if by_pid else None
        per = defaultdict(float)
        agg = defaultdict(float)
        for ev in trace["traceEvents"]:
            if ev.get("ph") != "X" or ev.get("pid") != device_pid:
                continue
            nm = ev.get("name", "?")
            if nm.startswith("jit_"):
                continue
            dur = ev.get("dur", 0.0) / 30
            per[nm] += dur
            info = meta.get(nm) or meta.get(nm.replace("-done", ""))
            if info is None:
                agg["unattr"] += dur
                continue
            _, op, fl, line = info
            comp = fl.replace(".py", "")
            if fl == "cost_volume.py":
                from m4depth_tpu.ops.cost_volume import spatial_cost_volume
                sncv_line = spatial_cost_volume.__code__.co_firstlineno
                comp = "sncv" if line >= sncv_line else "dscv"
            agg[comp] += dur
        total = sum(per.values())
        print(f"device total {total:.0f} us/step")
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"  {v:8.1f}  {k}")
        print("  -- top ops --")
        for nm, us in sorted(per.items(), key=lambda kv: -kv[1])[:16]:
            shape, op, fl, line = (meta.get(nm)
                                   or meta.get(nm.replace("-done", ""))
                                   or ("?", "?", "?", 0))
            tail = "/".join(op.split("/")[-2:])[:44]
            print(f"  {us:8.1f} {100*us/total:4.1f}% {nm[:20]:20s} "
                  f"{shape:48s} {fl}:{line} {tail}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Train-step profiler with non-overlapping attribution (real TPU).

Round-2's per-op attribution double-counted overlapping device events
(~2x the wall). This tool attributes each device-time point to the
INNERMOST enclosing trace event per thread lane (stack sweep over the
chrome trace), then groups by (forward/backward, component):

  * backward ops are identified from HLO metadata: XLA marks gradient ops
    with `transpose(jvp(...))` in op_name;
  * components come from source_file, with cost_volume.py split into
    dscv/sncv by line.

Usage: python tools/train_prof.py [--batch 3] [--seq 4] [--size 384]
       [--levels 6] [--steps 10] [--time_axis auto] [--remat none]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/m4depth_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def innermost_attribution(events):
    """Assign each covered time-point to its innermost event (per tid).

    events: list of (ts, dur, name). Returns {name: exclusive_us}.
    Chrome-trace device events are properly nested within a lane.
    """
    out = defaultdict(float)
    marks = []
    for ts, dur, name in events:
        marks.append((ts, 0, dur, name))          # start (0 sorts first)
        marks.append((ts + dur, 1, dur, name))    # end
    marks.sort(key=lambda m: (m[0], m[1], -m[2]))
    stack = []
    last_t = None
    for t, kind, dur, name in marks:
        if stack and last_t is not None and t > last_t:
            out[stack[-1]] += t - last_t
        if kind == 0:
            stack.append(name)
        else:
            # pop the matching name (robust to slight nesting violations)
            if name in stack:
                stack.remove(name)
        last_t = t
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--seq", type=int, default=4)
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--levels", type=int, default=6)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--time_axis", default="auto")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize decoder levels in the backward")
    ap.add_argument("--remat_policy", default="dscv", choices=["dscv", "all"],
                    help="with --remat: 'dscv' saves everything except the "
                         "DSCV expansion/gather temps; 'all' is blanket")
    ap.add_argument("--chunk_bytes", type=int, default=30 << 20)
    ap.add_argument("--dscv_impl", default="rows")
    ap.add_argument("--row_group", type=int, default=2,
                    help="rows impl: y-shifts per fetched row (divides 2r+2)")
    ap.add_argument("--x_window", type=int, default=5,
                    help="rows impl: direction-narrowed fetch box width "
                         "(default 5 = shipped config)")
    ap.add_argument("--xw_dual", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="rows impl: dual-operand narrow fetch (exact for "
                         "all motions at x_window >= row_group+3). Default "
                         "on = shipped config")
    ap.add_argument("--no_profile", action="store_true")
    ap.add_argument("--para_direct", action="store_true")
    ap.add_argument("--scan_unroll", type=int, default=2)
    ap.add_argument("--dscv_bwd", default="xla",
                    choices=["xla", "corner", "pallas"],
                    help="DSCV backward strategy (config.dscv_bwd)")
    ap.add_argument("--xla_opt", action="append", default=[],
                    help="key=value TPU compiler option (per-jit "
                         "compiler_options; client XLA_FLAGS can't carry "
                         "TPU flags through the tunnel)")
    args = ap.parse_args()
    copts = dict(kv.split("=", 1) for kv in args.xla_opt) or None

    from m4depth_tpu.config import ModelConfig
    from m4depth_tpu.models import M4Depth
    from m4depth_tpu.train.step import create_train_state, make_train_step

    cfg = ModelConfig(num_levels=args.levels, compute_dtype="bfloat16",
                      dscv_impl=args.dscv_impl, time_axis=args.time_axis,
                      remat=args.remat, remat_policy=args.remat_policy,
                      dscv_chunk_bytes=args.chunk_bytes,
                      dscv_para_direct=args.para_direct,
                      scan_unroll=args.scan_unroll,
                      dscv_row_group=args.row_group,
                      dscv_x_window=args.x_window,
                      dscv_xw_dual=args.xw_dual,
                      dscv_bwd=args.dscv_bwd)
    model = M4Depth(cfg)
    b, T, hw = args.batch, args.seq, args.size
    rng = np.random.RandomState(0)
    batch = {
        "rgb": jnp.asarray(rng.rand(b, T, hw, hw, 3).astype(np.float32)),
        "depth": jnp.asarray(
            (1.0 + 60 * rng.rand(b, T, hw, hw, 1)).astype(np.float32)),
        "rot": jnp.tile(jnp.array([[[1.0, 0.001, -0.002, 0.0005]]],
                                  jnp.float32), (b, T, 1)),
        "trans": jnp.tile(jnp.array([[[0.05, 0.02, 0.4]]], jnp.float32),
                          (b, T, 1)),
        "camera_f": jnp.full((b, 2), hw / 2.0),
        "camera_c": jnp.full((b, 2), hw / 2.0),
    }
    sample = dict(batch)
    sample["rgb"] = batch["rgb"][:, :2, :64, :64]
    sample["depth"] = batch["depth"][:, :2, :64, :64]
    sample["rot"], sample["trans"] = batch["rot"][:, :2], batch["trans"][:, :2]
    state = create_train_state(model, jax.random.PRNGKey(0), sample)
    step = jax.jit(make_train_step(model), donate_argnums=(0,),
                   compiler_options=copts)

    t0 = time.perf_counter()
    state, aux = step(state, batch)
    float(aux["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s",
          flush=True)
    for _ in range(3):
        state, aux = step(state, batch)
    float(aux["loss"])

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, aux = step(state, batch)
        float(aux["loss"])
        best = min(best, (time.perf_counter() - t0) / args.steps)
    print(f"train step: {1e3 * best:.1f} ms  (b={b} T={T} {hw}^2 "
          f"d{args.levels} {args.dscv_impl} time_axis={args.time_axis} "
          f"remat={args.remat}"
          f"{':' + args.remat_policy if args.remat else ''})")
    if args.no_profile:
        return

    hlo = step.lower(state, batch).compile().as_text()
    meta = {}
    for m in re.finditer(
            r'%?([\w.-]+) = [^\n]*?metadata={op_name="([^"]*)" '
            r'source_file="([^"]*)" source_line=(\d+)', hlo):
        meta[m.group(1)] = (m.group(2), os.path.basename(m.group(3)),
                            int(m.group(4)))
    # kCustom fusion instructions carry no metadata of their own; map them
    # through their called computation's dominant source op (first op with
    # metadata inside the computation body)
    comp_meta = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r'%?([\w.-]+) \(', line)
        if m and ("fused_computation" in m.group(1)
                  or line.rstrip().endswith("{")):
            cur = m.group(1)
            continue
        if cur and cur not in comp_meta:
            mm = re.search(r'metadata={op_name="([^"]*)" '
                           r'source_file="([^"]*)" source_line=(\d+)', line)
            if mm and ("scatter" in line or "gather" in line
                       or "dot(" in line or "convolution" in line):
                comp_meta[cur] = (mm.group(1),
                                  os.path.basename(mm.group(2)),
                                  int(mm.group(3)))
    cur = None
    comp_any = {}
    for line in hlo.splitlines():
        m = re.match(r'%?([\w.-]+) \(', line)
        if m:
            cur = m.group(1)
            continue
        if cur and cur not in comp_any:
            mm = re.search(r'metadata={op_name="([^"]*)" '
                           r'source_file="([^"]*)" source_line=(\d+)', line)
            if mm:
                comp_any[cur] = (mm.group(1), os.path.basename(mm.group(2)),
                                 int(mm.group(3)))
    for m in re.finditer(r'%?([\w.-]+) = [^\n]*? calls=%([\w.-]+)', hlo):
        if m.group(1) not in meta:
            info = comp_meta.get(m.group(2)) or comp_any.get(m.group(2))
            if info:
                meta[m.group(1)] = info
    with jax.profiler.trace("/tmp/m4depth_train_prof"):
        for _ in range(5):
            state, aux = step(state, batch)
        float(aux["loss"])
    paths = glob.glob(
        "/tmp/m4depth_train_prof/plugins/profile/*/*.trace.json.gz")
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as fh:
        trace = json.load(fh)
    device_pid = ops_tid = None
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "M":
            continue
        if (ev.get("name") == "process_name"
                and "/device:" in str(ev.get("args", {}).get("name"))):
            device_pid = ev.get("pid")
        if (ev.get("name") == "thread_name"
                and str(ev.get("args", {}).get("name")) == "XLA Ops"):
            ops_tid = (ev.get("pid"), ev.get("tid"))
    per = defaultdict(float)
    if ops_tid is not None and ops_tid[0] == device_pid:
        # the "XLA Ops" lane is already non-overlapping leaf ops and sums
        # to the step wall — use it directly
        for ev in trace["traceEvents"]:
            if (ev.get("ph") == "X" and ev.get("pid") == device_pid
                    and ev.get("tid") == ops_tid[1]):
                per[ev.get("name", "?")] += ev.get("dur", 0.0) / 5
    else:  # fallback: innermost-event sweep per lane
        by_tid = defaultdict(list)
        for ev in trace["traceEvents"]:
            if ev.get("ph") != "X" or ev.get("pid") != device_pid:
                continue
            nm = ev.get("name", "?")
            if nm.startswith("jit_"):
                continue
            by_tid[ev.get("tid")].append(
                (ev.get("ts"), ev.get("dur", 0.0), nm))
        for tid, evs in by_tid.items():
            for nm, us in innermost_attribution(evs).items():
                per[nm] += us / 5

    from m4depth_tpu.ops.cost_volume import spatial_cost_volume
    sncv_line = spatial_cost_volume.__code__.co_firstlineno

    agg = defaultdict(float)
    for nm, us in per.items():
        info = meta.get(nm) or meta.get(nm.replace("-done", ""))
        if info is None:
            agg[("?", "unattr")] += us
            continue
        op, fl, line = info
        direction = "bwd" if "transpose(" in op else "fwd"
        comp = fl.replace(".py", "")
        if fl == "cost_volume.py":
            comp = "sncv" if line >= sncv_line else "dscv"
        agg[(direction, comp)] += us
    total = sum(per.values())
    print(f"device total {total:.0f} us/step")
    for (direction, comp), us in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {us:9.1f}  {direction:4s} {comp}")
    fwd = sum(us for (d, _), us in agg.items() if d == "fwd")
    bwd = sum(us for (d, _), us in agg.items() if d == "bwd")
    print(f"  fwd {fwd:.0f} us, bwd {bwd:.0f} us, other "
          f"{total - fwd - bwd:.0f} us")
    print("  -- top ops --")
    rows = sorted(per.items(), key=lambda kv: -kv[1])[:18]
    for nm, us in rows:
        op, fl, line = (meta.get(nm) or meta.get(nm.replace("-done", ""))
                        or ("?", "?", 0))
        tail = "/".join(op.split("/")[-2:])[:52]
        print(f"  {us:8.1f} {100 * us / total:4.1f}% {nm[:22]:22s} "
              f"{fl}:{line} {tail}")


if __name__ == "__main__":
    main()

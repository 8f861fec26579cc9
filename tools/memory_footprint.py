#!/usr/bin/env python
"""HBM footprint of streaming inference (the reference claims ~500 MB VRAM,
README.md:15). Reports device memory after warmup: params + temporal state
+ executable workspace.

Usage: python tools/memory_footprint.py [--size 384] [--levels 6]
"""

import argparse
import os
import sys

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
    p.add_argument("--size", type=int, default=384)
    p.add_argument("--levels", type=int, default=6)
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
    for t in range(3):
        state, depth = step(params, state, rgb, rot, trans, f, c,
                            jnp.full((b,), t == 0))
    np.asarray(depth)

    nbytes = lambda t: sum(  # noqa: E731
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(t))
    stats = jax.devices()[0].memory_stats() or {}
    exec_ws = step.lower(params, state, rgb, rot, trans, f, c,
                         jnp.zeros((b,), bool)).compile()
    mem = exec_ws.memory_analysis()
    mib = 1024 * 1024
    print(f"params:           {nbytes(params)/mib:8.1f} MiB")
    print(f"temporal state:   {nbytes(state)/mib:8.1f} MiB")
    if mem is not None:
        print(f"exec temp buffers:{mem.temp_size_in_bytes/mib:8.1f} MiB")
        print(f"exec args+output: {(mem.argument_size_in_bytes + mem.output_size_in_bytes)/mib:8.1f} MiB")
        total = (nbytes(params) + nbytes(state)
                 + mem.temp_size_in_bytes) / mib
        print(f"steady-state streaming footprint: ~{total:.0f} MiB "
              f"(reference claim: ~500 MB, README.md:15)")
    if stats:
        print(f"device bytes_in_use: {stats.get('bytes_in_use', 0)/mib:.1f} MiB"
              f" (peak {stats.get('peak_bytes_in_use', 0)/mib:.1f} MiB)")


if __name__ == "__main__":
    main()

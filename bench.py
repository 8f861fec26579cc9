"""Benchmark: streaming depth inference throughput on one TPU chip.

Flagship config: M4Depth d6, 384x384 monocular stream, bf16 compute —
the reference's headline use case ("real-time" inference on "most GPUs",
README.md:15-16; BASELINE.json north star: >10x frames/sec/chip vs the
TF-GPU reference).

Frames are chained on-device with ``lax.scan`` (the recurrence is inherently
sequential), so the measurement reflects chip throughput, not host dispatch
latency.

Prints ONE JSON line:
  {"metric": "stream_fps_384", "value": N, "unit": "frames/sec/chip",
   "vs_baseline": N / 30.0}
vs_baseline normalizes by 30 fps — the reference's qualitative "real-time"
claim — so vs_baseline >= 10 means the >10x north star is met.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 30.0  # reference "real-time" claim (README.md:16)
CHUNK = 32           # frames per device invocation


def main():
    from m4depth_tpu.config import ModelConfig
    from m4depth_tpu.geometry import Camera
    from m4depth_tpu.models import M4Depth, init_state

    cfg = ModelConfig(num_levels=6, compute_dtype="bfloat16")
    model = M4Depth(cfg)
    b, h, w = 1, 384, 384

    rng = np.random.RandomState(0)
    rgb_i = jnp.asarray(rng.rand(b, 2, 64, 64, 3).astype(np.float32))
    rot_i = jnp.tile(jnp.array([[[1.0, 0, 0, 0]]], jnp.float32), (b, 2, 1))
    trans_i = jnp.tile(jnp.array([[[0.05, 0.0, 0.4]]], jnp.float32), (b, 2, 1))
    cam_i = Camera(f=jnp.full((b, 2), 32.0), c=jnp.full((b, 2), 32.0))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), rgb_i, rot_i, trans_i, cam_i)

    cam = Camera(f=jnp.full((b, 2), 192.0), c=jnp.full((b, 2), 192.0))
    go = jnp.zeros((b,), bool)

    @jax.jit
    def run_chunk(params, state, frames, rots, transs):
        def body(st, inp):
            rgb, rot, trans = inp
            st, d = model.apply(params, st, rgb, rot, trans, cam, go,
                                method=M4Depth.step)
            return st, d[:, ::64, ::64, 0]  # tiny summary to keep output live

        return jax.lax.scan(body, state, (frames, rots, transs))

    frames = jnp.asarray(rng.rand(CHUNK, b, h, w, 3).astype(np.float32))
    rots = jnp.tile(jnp.array([[[1.0, 0.001, -0.002, 0.0005]]], jnp.float32),
                    (CHUNK, b, 1))
    transs = jnp.tile(jnp.array([[[0.05, 0.02, 0.4]]], jnp.float32),
                      (CHUNK, b, 1))
    state = init_state(cfg, b, h, w)

    # warmup / compile
    state, out = run_chunk(params, state, frames, rots, transs)
    jax.block_until_ready(out)

    n_chunks = 8
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, out = run_chunk(params, state, frames, rots, transs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = n_chunks * CHUNK * b / dt
    print(json.dumps({
        "metric": "stream_fps_384",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()

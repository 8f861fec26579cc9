"""Benchmark: streaming depth inference throughput on one TPU chip.

Flagship config: M4Depth d6, 384x384 monocular stream, bf16 compute —
the reference's headline use case ("real-time" inference on "most GPUs",
README.md:15-16; BASELINE.json north star: >10x frames/sec/chip vs the
TF-GPU reference).

All runtime inputs (camera intrinsics included) are jit arguments — closing
over them as constants triggers an XLA constant-folding pathology that
dominates the step time.

Prints ONE JSON line:
  {"metric": "stream_fps_384", "value": N, "unit": "frames/sec/chip",
   "vs_baseline": N / 30.0}
vs_baseline normalizes by 30 fps — the reference's qualitative "real-time"
claim — so vs_baseline >= 10 means the >10x north star is met.

Scope of the claim: DEVICE-RESIDENT input. The timed loop re-feeds the same
host array (fresh-frame h2d transfer cost is excluded) because the tunneled
transport leaks host memory on every distinct h2d transfer (DEVELOPMENT.md
"Tunnel transport leaks"); a production deployment would overlap the ~0.9 MB
bf16 frame transfer with the ~5 ms step via double buffering, so the
steady-state number is representative there too. A measured TF-CPU reference
anchor lives in BASELINE.md next to the assumed 30 fps.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent compile cache: repeat runs skip the ~60s XLA compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/m4depth_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

BASELINE_FPS = 30.0  # reference "real-time" claim (README.md:16)

# A wedged axon tunnel hangs device calls forever (observed: a multi-hour
# remote outage where even jax.devices() never returned). Bound the whole
# benchmark so the driver gets a clean failure instead of a stuck process;
# a cold compile through the tunnel takes 5-8 min, so 30 min is generous.
WATCHDOG_SECS = 1800


def _arm_watchdog():
    import os
    import threading

    def _bang():
        # keep the one-JSON-line contract even on a wedged tunnel so the
        # driver record is self-describing (VERDICT r3 "weak" #1)
        print(json.dumps({
            "metric": "stream_fps_384",
            "value": None,
            "unit": "frames/sec/chip",
            "vs_baseline": None,
            "error": f"watchdog: no result after {WATCHDOG_SECS}s "
                     "(TPU tunnel wedged?)",
        }), flush=True)
        os._exit(17)

    t = threading.Timer(WATCHDOG_SECS, _bang)
    t.daemon = True
    t.start()
    return t


def main():
    import os

    # M4DEPTH_BENCH_SMOKE=1: tiny shapes on the host CPU so the timed-block +
    # JSON contract can be exercised end-to-end without a TPU (the number it
    # prints is meaningless; the driver always runs the default path)
    smoke = os.environ.get("M4DEPTH_BENCH_SMOKE") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    watchdog = _arm_watchdog()
    from m4depth_tpu.config import ModelConfig
    from m4depth_tpu.geometry import Camera
    from m4depth_tpu.models import M4Depth, init_state

    cfg = ModelConfig(num_levels=3 if smoke else 6, compute_dtype="bfloat16")
    model = M4Depth(cfg)
    b, h, w = (1, 64, 64) if smoke else (1, 384, 384)

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
    f = jnp.full((b, 2), 192.0)
    c = jnp.full((b, 2), 192.0)
    go = jnp.zeros((b,), bool)

    # warmup / compile (np.asarray forces real completion — block_until_ready
    # can return early through the axon tunnel)
    state, depth = step(params, state, rgb, rot, trans, f, c,
                        jnp.ones((b,), bool))
    np.asarray(depth)
    for _ in range(10):
        state, depth = step(params, state, rgb, rot, trans, f, c, go)
    np.asarray(depth)

    # median-of-5 timed blocks with the spread reported: best-of-N hid a
    # ±5 fps session effect that made A/B claims impossible to reconcile
    # against driver captures (VERDICT r4 weak #2)
    n = 5 if smoke else 200
    block_fps = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n):
            state, depth = step(params, state, rgb, rot, trans, f, c, go)
        val = np.asarray(depth)
        block_fps.append(n * b / (time.perf_counter() - t0))
    assert np.all(np.isfinite(val)), "non-finite depth out of the bench model"

    fps = float(np.median(block_fps))
    watchdog.cancel()
    record = {
        # smoke mode measures 64x64 d3 on CPU — a different metric name (and
        # an explicit flag) so a leaked M4DEPTH_BENCH_SMOKE=1 in the driver's
        # environment can never masquerade as a 384^2 TPU regression
        "metric": "smoke_fps_64_cpu" if smoke else "stream_fps_384",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": None if smoke else round(fps / BASELINE_FPS, 3),
        "spread_min": round(min(block_fps), 2),
        "spread_max": round(max(block_fps), 2),
        "blocks": [round(x, 2) for x in block_fps],
    }
    if smoke:
        record["smoke"] = True
    print(json.dumps(record))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — the JSON line IS the report
        if isinstance(e, KeyboardInterrupt):
            raise
        import traceback

        traceback.print_exc()
        # backend-init failures (dead tunnel) previously died with a bare
        # traceback and rc=1, giving the driver a null record (BENCH_r03);
        # emit the single JSON line with an error field instead
        print(json.dumps({
            "metric": "stream_fps_384",
            "value": None,
            "unit": "frames/sec/chip",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:500],
        }), flush=True)
        raise SystemExit(18)

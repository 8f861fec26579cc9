#!/usr/bin/env python
"""End-to-end geometric learning validation on synthetic plane sequences.

Trains the flagship model from scratch on analytically consistent
(frames, depth, motion) data and reports held-out depth metrics. A correct
geometry/cost-volume/decoder stack learns this task quickly; geometry bugs
cap the achievable accuracy. Results are recorded in VALIDATION.md.

Usage: python tools/synthetic_validation.py [--steps 600] [--size 64]
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
    p.add_argument("--mode", default="overfit",
                   choices=["overfit", "generalize"],
                   help="overfit: geometry gate — fit ONE batch to near-zero "
                        "error (fails iff the geometry/cost-volume stack is "
                        "broken). generalize: train on a pool of scenes and "
                        "report held-out metrics (a training-recipe study, "
                        "no hard gate).")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--T", type=int, default=2,
                   help="frames per training window (reference trains T=4)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--pool", type=int, default=320,
                   help="pregenerated training batches (cycled)")
    p.add_argument("--levels", type=int, default=4)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--model", default="m4depth",
                   choices=["m4depth", "m4depth-v1"])
    a = p.parse_args()
    if a.mode == "overfit":
        a.steps = a.steps or 1000
        a.lr = a.lr or 2e-4
        a.pool = 1
        a.batch = 4
    else:
        a.steps = a.steps or 15000
        a.lr = a.lr or 1e-4

    from m4depth_tpu.config import ModelConfig
    from m4depth_tpu.data.synthetic import SyntheticGeometricDataset
    from m4depth_tpu.metrics import clip_for_eval, compute_metrics
    from m4depth_tpu.models import M4Depth
    from m4depth_tpu.train import make_train_step

    cfg = ModelConfig(num_levels=a.levels, compute_dtype="bfloat16")
    if a.model == "m4depth-v1":
        from m4depth_tpu.models.m4depth_v1 import M4DepthV1

        model = M4DepthV1(cfg)
    else:
        model = M4Depth(cfg)

    h = w = a.size
    train_ds = SyntheticGeometricDataset(
        n_batches=a.pool, batch_size=a.batch, T=a.T, h=h, w=w, seed=0)

    def to_jnp(b):
        return {k: jnp.asarray(v) for k, v in b.items() if k != "new_traj"}

    if a.pool > 0:
        print(f"pregenerating {a.pool} batches...", flush=True)
        pool = [to_jnp(b) for b in train_ds.batches(0)]
        get_batch = lambda i: pool[i % len(pool)]  # noqa: E731
    else:
        # infinite stream: fresh scenes every step (no memorization),
        # generated ON DEVICE — zero host->device transfers in the loop
        # (the tunneled transport leaks host memory per transfer, and a
        # host renderer gates throughput on single-core machines; see
        # device_batch_sampler)
        from m4depth_tpu.data.synthetic import device_batch_sampler

        gen = device_batch_sampler(a.batch, a.T, h, w)
        stream_key = jax.random.PRNGKey(1234)

        def get_batch(i):
            return gen(jax.random.fold_in(stream_key, i))

        pool = [get_batch(0)]

    import optax
    from flax.training.train_state import TrainState

    from m4depth_tpu.train.step import batch_camera

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), pool[0]["rgb"], pool[0]["rot"],
        pool[0]["trans"], batch_camera(pool[0]))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, a.lr, warmup_steps=200, decay_steps=a.steps,
        end_value=a.lr * 0.05)
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=optax.chain(optax.clip_by_global_norm(1.0),
                       optax.adam(schedule)))
    tstep = jax.jit(make_train_step(model), donate_argnums=(0,))

    t0 = time.time()
    for step_i in range(a.steps):
        state, scal = tstep(state, get_batch(step_i))
        if step_i % 25 == 0:
            loss_now = float(scal["loss"])  # bound the dispatch pipeline
        if step_i % 250 == 0:
            print(f"step {step_i}: loss={loss_now:.4f} "
                  f"RMSE_log={float(scal['RMSE_log']):.4f}", flush=True)
    print(f"trained {a.steps} steps in {time.time() - t0:.1f}s", flush=True)

    if a.mode == "overfit":
        eval_ds = train_ds   # the gate: near-zero error on the fitted batch
    else:
        eval_ds = SyntheticGeometricDataset(
            n_batches=8, batch_size=a.batch, T=a.T, h=h, w=w, seed=7777)

    @jax.jit
    def eval_batch(params, batch):
        from m4depth_tpu.train.step import batch_camera

        preds = model.apply(params, batch["rgb"], batch["rot"],
                            batch["trans"], batch_camera(batch))
        gt = batch["depth"][:, -1]
        est = model.final_depth(preds, gt.shape[1:3])
        gt_c, est_c = clip_for_eval(gt, est)
        return compute_metrics(gt_c, est_c)

    agg = {}
    n = 0
    for batch in eval_ds.batches(0):
        m = eval_batch(state.params, to_jnp(batch))
        for k, v in m.items():
            agg[k] = agg.get(k, 0.0) + float(v)
        n += 1
    results = {k: v / n for k, v in agg.items()}
    label = "fitted-batch" if a.mode == "overfit" else "held-out"
    print(f"{label}:", {k: round(v, 4) for k, v in results.items()},
          flush=True)
    if a.mode == "overfit":
        ok = results["AbsRel"] < 0.10 and results["Delta1"] > 0.95
        print("GEOMETRY VALIDATION", "PASSED" if ok else "FAILED", flush=True)
        return 0 if ok else 1
    print("generalization study (no gate); best known recipe results are "
          "recorded in VALIDATION.md", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

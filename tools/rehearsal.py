#!/usr/bin/env python
"""Full-scale training rehearsal: the REAL harness at the reference config.

Drives `train/loop.py::fit` — Orbax rolling checkpoints, the NaN tripwire,
throughput telemetry, per-epoch subprocess validation (a CPU child running
the full CLI `--mode=validation` path including BestCheckpointManager
majority voting) — for >= 50k optimizer steps at the reference training
geometry (384^2, d6, batch 3, seq 4, bf16; /root/reference/main.py:105-109
trains 220k steps at this config) on the device-resident synthetic stream
(zero h2d transfers in the loop — the tunneled transport leaks per transfer,
DEVELOPMENT.md).

Validation data: synthetic scenes exported ONCE to the Mid-Air on-disk
layout (data/synthetic.py::export_midair_format), so the child's decode /
adapter / metric path is the real one and its AbsRel tracks true quality.

Kill/resume: this process can be killed at any point; relaunching with the
same --workdir resumes from the latest rolling checkpoint (the stream is a
pure function of (seed, epoch, step), so the data replays exactly).

Extending a finished run: relaunching with a LARGER --steps resumes from
the last checkpoint and trains on toward the new total. The cosine LR
schedule is a function of (step, total_steps), so the extension is a warm
restart — at the old endpoint the LR jumps from ~0 back onto the longer
schedule's mid-curve (e.g. 50k->100k resumes at lr = 0.5 * peak) and decays
to zero at the new total. Optimizer moments carry over; the data stream
continues epoch-exactly. The best-K ledger and heldout.json both append,
so one workdir accumulates the full quality history across extensions.

Usage:
  python tools/rehearsal.py --workdir /tmp/rehearsal --steps 50000
  # ... kill it mid-run, relaunch with the same command -> resumes
  python tools/rehearsal.py --workdir /tmp/rehearsal --steps 100000  # extend
  python tools/rehearsal.py --workdir /tmp/rehearsal --heldout_only
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

if "--platform=cpu" in sys.argv:  # CPU smoke runs (env vars are too late —
    sys.argv.remove("--platform=cpu")  # this environment preimports jax)
    jax.config.update("jax_platforms", "cpu")

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/m4depth_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def ensure_valdata(workdir: str, h: int, w: int, n_traj: int = 3,
                   frames: int = 8) -> str:
    """Export the validation dataset once; return its location-config path."""
    from m4depth_tpu.data.synthetic import export_midair_format

    val_root = os.path.join(workdir, "valdata")
    cfg_path = os.path.join(val_root, "datasets_location.json")
    if not os.path.isfile(cfg_path):
        db = os.path.join(val_root, "db")
        rec = os.path.join(val_root, "records")
        n = export_midair_format(db, rec, n_traj=n_traj, frames=frames,
                                 h=h, w=w, seed=424242)
        os.makedirs(val_root, exist_ok=True)
        with open(cfg_path, "w") as f:
            json.dump({"midair": db}, f)
        print(f"exported {n} validation frames to {val_root}", flush=True)
    return cfg_path


def heldout_eval(model, params, batch_gen, n_batches: int = 8):
    """Cross-generator check: host-rendered scenes from an unseen seed."""
    import jax.numpy as jnp

    from m4depth_tpu.metrics import clip_for_eval, compute_metrics
    from m4depth_tpu.train.step import batch_camera

    @jax.jit
    def eval_batch(params, batch):
        preds = model.apply(params, batch["rgb"], batch["rot"],
                            batch["trans"], batch_camera(batch))
        gt = batch["depth"][:, -1]
        est = model.final_depth(preds, gt.shape[1:3])
        gt_c, est_c = clip_for_eval(gt, est)
        return compute_metrics(gt_c, est_c)

    agg, n = {}, 0
    for batch in batch_gen:
        m = eval_batch(params, {k: jnp.asarray(v) for k, v in batch.items()
                                if k != "new_traj"})
        for k, v in m.items():
            agg[k] = agg.get(k, 0.0) + float(v)
        n += 1
        if n >= n_batches:
            break
    return {k: round(v / n, 4) for k, v in agg.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/m4depth_rehearsal")
    p.add_argument("--steps", type=int, default=50000)
    p.add_argument("--steps_per_epoch", type=int, default=1000)
    p.add_argument("--size", type=int, default=384)
    p.add_argument("--batch", type=int, default=3)
    p.add_argument("--T", type=int, default=4)
    p.add_argument("--levels", type=int, default=6)
    p.add_argument("--lr", type=float, default=1.5e-4)
    p.add_argument("--lr_schedule", default="cosine")
    p.add_argument("--keep_top_n", type=int, default=3)
    p.add_argument("--val_max_batches", type=int, default=0,
                   help="bound the validation child's eval (0 = all frames)")
    p.add_argument("--heldout_only", action="store_true",
                   help="skip training; evaluate the latest checkpoint on "
                        "held-out host-rendered scenes")
    a = p.parse_args()

    from m4depth_tpu.cli.main import SubprocessValidator
    from m4depth_tpu.config import ModelConfig, TrainConfig
    from m4depth_tpu.data.synthetic import (
        DeviceSyntheticStream,
        SyntheticGeometricDataset,
    )
    from m4depth_tpu.models import M4Depth
    from m4depth_tpu.train.loop import fit

    os.makedirs(a.workdir, exist_ok=True)
    h = w = a.size
    val_cfg_path = ensure_valdata(a.workdir, h, w)
    ckpt_dir = os.path.join(a.workdir, "ckpt")

    cfg = ModelConfig(num_levels=a.levels, compute_dtype="bfloat16")
    model = M4Depth(cfg)

    if not a.heldout_only:
        dataset = DeviceSyntheticStream(
            a.batch, a.T, h, w, steps_per_epoch=a.steps_per_epoch, seed=1234)
        tcfg = TrainConfig(
            learning_rate=a.lr, lr_schedule=a.lr_schedule,
            grad_clip_norm=1.0, total_steps=a.steps, seed=42,
            ckpt_dir=ckpt_dir, log_dir=None,
            keep_last_n=5, keep_top_n=a.keep_top_n,
            summary_interval=250)

        # the validation child runs the REAL CLI validation mode on CPU:
        # restore latest ckpt -> evaluate on the exported Mid-Air-format
        # scenes -> append the ledger + best-K majority vote
        # (cli/main.py:343-388). Model flags must rebuild the same model.
        validator = SubprocessValidator(
            cmd=None,
            args=[
                sys.executable, "-m", "m4depth_tpu.cli.main",
                "--mode=validation", "--platform=cpu", "--dataset=midair",
                f"--db_path_config={val_cfg_path}",
                "--records_path=" + os.path.join(
                    os.path.dirname(val_cfg_path), "records"),
                f"--ckpt_dir={ckpt_dir}",
                f"--arch_depth={a.levels}",
                f"--keep_top_n={a.keep_top_n}",
                f"--validation_max_batches={a.val_max_batches}",
                "--compute_dtype=float32",   # CPU child; param structure
                "--cv_dtype=float32",        # matches regardless of dtype
                "--num_workers=2",
            ],
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
        )
        validator._log_path = os.path.join(a.workdir,
                                           "validation-subprocess.log")

        t0 = time.time()
        state = fit(model, dataset, tcfg, total_steps=a.steps, resume=True,
                    validation_fn=validator, log_every=250)
        print(f"rehearsal finished in {time.time() - t0:.0f}s", flush=True)
        params = state.params
    else:
        from m4depth_tpu.train.checkpoints import TrainCheckpointManager
        from m4depth_tpu.train.step import create_train_state

        sample = next(SyntheticGeometricDataset(
            n_batches=1, batch_size=1, T=2, h=64, w=64, seed=0).batches(0))
        sample = {k: v for k, v in sample.items() if k != "new_traj"}
        st = create_train_state(model, jax.random.PRNGKey(0), sample)
        mgr = TrainCheckpointManager(os.path.join(ckpt_dir, "train"))
        assert mgr.latest_epoch is not None, "no checkpoint to evaluate"
        print(f"evaluating checkpoint epoch {mgr.latest_epoch}")
        params = mgr.restore_latest(st).params
        mgr.close()

    # held-out quality: HOST-rendered scenes from an unseen seed (a
    # cross-generator check on top of unseen-scene generalization)
    heldout = SyntheticGeometricDataset(
        n_batches=8, batch_size=a.batch, T=a.T, h=h, w=w, seed=7777)
    results = heldout_eval(model, params, heldout.batches(0))
    print("held-out:", results, flush=True)
    with open(os.path.join(a.workdir, "heldout.json"), "a") as f:
        f.write(json.dumps({"ts": time.time(), **results}) + "\n")


if __name__ == "__main__":
    main()

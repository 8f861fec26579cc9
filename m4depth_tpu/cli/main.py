"""Entry point: train / finetune / eval / validation / predict.

Parity reference: main.py:37-173 — same modes, same checkpoint-directory
conventions (ckpt_dir/train for rolling training state, ckpt_dir/best for
validated backups), same output files (perfs-<dataset>.txt,
validation-perfs.txt).

Usage:
  python -m m4depth_tpu.cli.main --mode=train --dataset=midair \
      --records_path=data/midair/train_data --db_seq_len=8 --seq_len=4
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np


def build_model(cmd, cfg):
    from m4depth_tpu.models import M4Depth

    if getattr(cmd, "model", "m4depth") == "m4depth-v1":
        from m4depth_tpu.models.m4depth_v1 import M4DepthV1

        return M4DepthV1(cfg)
    return M4Depth(cfg)


def build_dataset(cmd, usecase: str, db_paths: dict, batch_size: int,
                  records_path=None, db_seq_len="unset"):
    from m4depth_tpu.data import SequenceDataset, get_adapter

    adapter = get_adapter(cmd.dataset)
    db_path = db_paths.get(cmd.dataset, "")
    seq = cmd.db_seq_len if db_seq_len == "unset" else db_seq_len
    if getattr(cmd, "record_store", None) and cmd.mode != "convert":
        # mmap windows off the pre-decoded store instead of decoding
        # JPEG/PNG per epoch (legacy TFRecord-DB parity, protobuf_db.py)
        from m4depth_tpu.data.records import RecordSequenceDataset

        # same crop semantics as the CSV branch below: Mid-Air finetune
        # random-crops a square intermediate down to the KITTI out_size
        adapter.set_output_size(
            cmd.out_size,
            crop=(usecase == "finetune" and cmd.dataset == "midair"))
        return RecordSequenceDataset(
            cmd.record_store,
            adapter=adapter,
            usecase=usecase,
            db_seq_len=seq,
            seq_len=cmd.seq_len,
            batch_size=batch_size,
            augment=not cmd.no_augmentation,
            seed=getattr(cmd, "seed", 42),
            num_workers=cmd.num_workers,
        )
    return SequenceDataset(
        adapter,
        db_path=db_path,
        records_path=records_path or cmd.records_path,
        usecase=usecase,
        db_seq_len=seq,
        seq_len=cmd.seq_len,
        batch_size=batch_size,
        augment=not cmd.no_augmentation,
        out_size=cmd.out_size,
        # reference finetune semantics for Mid-Air: decode to a SQUARE
        # intermediate and random-crop down to the (KITTI) out_size with
        # the principal point shifted (midair.py:91-106) — a plain resize
        # distorts aspect and bakes wrong intrinsics into training
        crop=(usecase == "finetune" and cmd.dataset == "midair"),
        seed=getattr(cmd, "seed", 42),
        num_workers=cmd.num_workers,
    )


class SubprocessValidator:
    """Background-process validation, the reference's scheme
    (callbacks.py:142-170): spawn ``--mode=validation`` after each epoch.

    Improvements over the reference's unconditional detached ``Popen``:
      * at most ONE child in flight — if the previous epoch's validation is
        still running, this epoch is skipped (the reference piles up
        processes when validation is slower than an epoch);
      * children are reaped (polled each call, waited on close) — no
        zombies;
      * the evaluated subset is boundable (``--validation_max_batches``) so
        the CPU-pinned child finishes within an epoch at real scale.

    The child defaults to CPU (JAX_PLATFORMS) so it never contends with the
    training chip — the TPU analog of the reference capping the validation
    process to 1200 MB of GPU memory (main.py:54-57).
    """

    def __init__(self, cmd, args=None, env=None):
        import subprocess

        self._subprocess = subprocess
        self._child = None
        self.spawned = 0
        self.skipped = 0
        self.failed = 0
        if args is not None:
            self.args, self.env = args, env or dict(os.environ)
            return
        self.env = dict(os.environ,
                        JAX_PLATFORMS=getattr(cmd, "validation_device", "cpu"))
        self.args = [
            sys.executable, "-m", "m4depth_tpu.cli.main",
            "--mode=validation",
            # in-process override as well: JAX_PLATFORMS is ignored on the
            # axon rig (the plugin wins backend init), and a child landing
            # on the trainer's TPU would fight it for the chip
            f"--platform={getattr(cmd, 'validation_device', 'cpu')}",
            "--dataset=kitti-raw",
            f"--db_path_config={cmd.db_path_config}",
            f"--ckpt_dir={cmd.ckpt_dir}",
            "--records_path=" + os.path.join(
                os.path.dirname(os.path.abspath(cmd.db_path_config)),
                "data", "kitti-raw-filtered", "val_data"),
            "--seq_len=4", "--db_seq_len=4",
            f"--arch_depth={cmd.arch_depth}",
            f"--keep_top_n={cmd.keep_top_n}",
            f"--validation_max_batches="
            f"{getattr(cmd, 'validation_max_batches', 0)}",
            # the child must rebuild the SAME model or its checkpoint
            # restore fails: forward every model-config flag
            f"--model={getattr(cmd, 'model', 'm4depth')}",
            f"--compute_dtype={cmd.compute_dtype}",
            f"--cv_dtype={getattr(cmd, 'cv_dtype', 'bfloat16')}",
            f"--dscv_impl={getattr(cmd, 'dscv_impl', 'split')}",
            f"--dscv_row_group={getattr(cmd, 'dscv_row_group', 2)}",
            f"--dscv_x_window={getattr(cmd, 'dscv_x_window', 5)}",
            ("--dscv_xw_dual" if getattr(cmd, 'dscv_xw_dual', True)
             else "--no-dscv_xw_dual"),
            f"--dscv_chunk_bytes={getattr(cmd, 'dscv_chunk_bytes', 30 << 20)}",
            f"--sncv_impl={getattr(cmd, 'sncv_impl', 'xla')}",
        ] + [f"--{flag}" for flag in (
            "no_DINL", "no_SNCV", "no_time_recurr",
            "no_feature_normalization", "no_feature_subdivision",
            "no_level_memory") if getattr(cmd, flag, False)]
        self._log_path = os.path.join(cmd.ckpt_dir,
                                      "validation-subprocess.log")

    @property
    def busy(self) -> bool:
        if self._child is None:
            return False
        if self._child.poll() is None:
            return True
        self._reap()
        return False

    def _reap(self):
        """Wait on the finished child and SURFACE a nonzero exit: a child
        that crashes every epoch (bad val path, rejected flag) otherwise
        leaves an empty best-K ledger with no hint beyond its log file."""
        self._child.wait()
        rc = self._child.returncode
        self._child = None
        if rc:
            self.failed += 1
            print(f"WARNING: validation subprocess exited rc={rc} "
                  f"(see {getattr(self, '_log_path', 'the child log')})",
                  flush=True)

    def __call__(self, params):
        del params  # the child restores the latest checkpoint itself
        if self.busy:
            self.skipped += 1
            print("validation subprocess still running; skipping this epoch",
                  flush=True)
            return None
        log_path = getattr(self, "_log_path", None)
        log = open(log_path, "ab") if log_path else self._subprocess.DEVNULL
        self._child = self._subprocess.Popen(
            self.args, env=self.env, stdout=log, stderr=log)
        if log_path:
            log.close()  # the child holds its own descriptor
        self.spawned += 1
        return None  # perfs land in the ledger asynchronously

    def close(self):
        """Wait for and reap any in-flight child."""
        if self._child is not None:
            self._reap()


def make_validation_fn(cmd, model, db_paths):
    """Per-epoch KITTI validation (the reference spawns a background process
    for this, callbacks.py:142-170; 'sync' runs it inline on the same chip)."""
    from m4depth_tpu.eval import evaluate, metrics_to_validation_perfs

    val_records = os.path.join(
        os.path.dirname(os.path.abspath(cmd.db_path_config)),
        "data", "kitti-raw-filtered", "val_data")

    # built once and reused across epochs — rebuilding per call re-globs and
    # re-reads every CSV manifest each epoch
    cached = {}

    def validation_fn(params):
        from m4depth_tpu.data import SequenceDataset, get_adapter

        ds = cached.get("ds")
        if ds is None:
            ds = cached["ds"] = SequenceDataset(
                get_adapter("kitti-raw"), db_paths.get("kitti-raw", ""),
                val_records, usecase="eval", db_seq_len=4, seq_len=4,
                batch_size=1, augment=False, num_workers=cmd.num_workers)
        metrics = evaluate(
            model, params, ds,
            max_steps=getattr(cmd, "validation_max_batches", 0))
        line = "\t\t".join(format(metrics[k], ".4f") for k in
                           ("AbsRel", "SqRel", "RMSE", "RMSE_log",
                            "Delta1", "Delta2", "Delta3"))
        os.makedirs(cmd.ckpt_dir, exist_ok=True)
        with open(os.path.join(cmd.ckpt_dir, "validation-perfs.txt"), "a") as f:
            f.write(line + "\n")
        return metrics_to_validation_perfs(metrics)

    return validation_fn


def restore_params_for_eval(cmd, model, sample_batch, weights_subdir: str):
    """Build params then restore from ckpt_dir/<subdir> (latest) or
    ckpt_dir/best (ledger winner)."""
    from m4depth_tpu.train import create_train_state
    from m4depth_tpu.train.checkpoints import (
        BestCheckpointManager,
        TrainCheckpointManager,
    )

    state = create_train_state(model, jax.random.PRNGKey(0), sample_batch)
    if weights_subdir == "best":
        best = BestCheckpointManager(
            os.path.join(cmd.ckpt_dir, "train"),
            os.path.join(cmd.ckpt_dir, "best"),
            keep_top_n=cmd.keep_top_n)
        restored = best.restore_best(state)
        if restored is not None:
            return restored.params
        weights_subdir = "train"  # fall back to the rolling store
    mgr = TrainCheckpointManager(os.path.join(cmd.ckpt_dir, weights_subdir))
    if mgr.latest_epoch is None:
        print("No checkpoint found; proceeding with scratch initialization")
        params = state.params
    else:
        params = mgr.restore_latest(state).params
    mgr.close()
    return params


def init_sample(cmd, h=64, w=64):
    rng = np.random.RandomState(0)
    rot = np.tile(np.array([1.0, 0, 0, 0], np.float32), (1, 2, 1))
    return {
        "rgb": rng.rand(1, 2, h, w, 3).astype(np.float32),
        "depth": rng.uniform(1, 50, (1, 2, h, w, 1)).astype(np.float32),
        "rot": rot.astype(np.float32),
        "trans": np.tile(np.array([0.05, 0, 0.4], np.float32), (1, 2, 1)),
        "camera_f": np.full((1, 2), w / 2, np.float32),
        "camera_c": np.full((1, 2), w / 2, np.float32),
    }


def main(argv=None):
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    from m4depth_tpu.cli.options import (
        build_parser,
        dataset_locations,
        model_config_from_args,
        train_config_from_args,
    )

    build_parser(parser)
    cmd, unknown = parser.parse_known_args(argv)
    if unknown:
        # tolerated (forward/experiment flags may ride along) but NEVER
        # silent: a misspelled --enable_validatoin would otherwise change a
        # multi-day run's behavior with no diagnostic anywhere
        print(f"WARNING: ignoring unrecognized arguments: {unknown}",
              flush=True)
    if getattr(cmd, "platform", "") :
        # must happen before any device call; the JAX_PLATFORMS env var is
        # NOT honored on this rig (the axon plugin wins at backend init), so
        # CPU children — e.g. the per-epoch validation subprocess running
        # next to a TPU trainer — need the in-process override
        jax.config.update("jax_platforms", cmd.platform)
    db_paths = dataset_locations(cmd)

    if cmd.mode == "convert":
        from m4depth_tpu.data import get_adapter
        from m4depth_tpu.data.records import convert_csv_dataset

        if not cmd.record_store:
            parser.error("--mode=convert requires --record_store=<out_dir>")
        n = convert_csv_dataset(
            get_adapter(cmd.dataset),
            db_path=db_paths.get(cmd.dataset, ""),
            records_path=cmd.records_path,
            out_dir=cmd.record_store,
            num_workers=cmd.num_workers,
            out_size=cmd.out_size,
        )
        print(f"converted {n} trajectories into {cmd.record_store}")
        return 0

    if cmd.mode == "promote":
        from m4depth_tpu.train import create_train_state
        from m4depth_tpu.train.checkpoints import promote_best_to_train

        dest = cmd.promote_dest or cmd.ckpt_dir
        cfg = model_config_from_args(cmd)
        model = build_model(cmd, cfg)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   init_sample(cmd))
        epoch = promote_best_to_train(
            os.path.join(cmd.ckpt_dir, "best"),
            os.path.join(dest, "train"), state,
            keep_top_n=cmd.keep_top_n)
        if epoch is None:
            print(f"no best checkpoint in {cmd.ckpt_dir}/best to promote")
            return 1
        print(f"promoted best checkpoint (epoch {epoch}) to {dest}/train")
        return 0

    if cmd.mode in ("train", "finetune"):
        from m4depth_tpu.train.loop import fit

        if getattr(cmd, "augment_device", False):
            cmd.no_augmentation = True  # host pipeline only decodes
        dataset = build_dataset(
            cmd, "finetune" if cmd.mode == "finetune" else "train",
            db_paths, cmd.batch_size)
        cfg = model_config_from_args(cmd, depth_type=dataset.depth_type)
        model = build_model(cmd, cfg)
        tcfg = train_config_from_args(cmd)

        validation_fn = None
        if cmd.enable_validation:
            if cmd.validation_mode == "subprocess":
                validation_fn = SubprocessValidator(cmd)
            else:
                validation_fn = make_validation_fn(cmd, model, db_paths)

        if cmd.mode == "finetune":
            from m4depth_tpu.cli.options import finetune_total_steps

            total = finetune_total_steps(cmd.ckpt_dir, cmd.finetune_steps,
                                         len(dataset))
        else:
            total = cmd.total_steps
        augment_fn = None
        if getattr(cmd, "augment_device", False):
            from m4depth_tpu.data.augment_device import make_batch_augment

            augment_fn = make_batch_augment(
                dataset=cmd.dataset,
                usecase="finetune" if cmd.mode == "finetune" else "train",
                # with host augmentation disabled the decode path yields the
                # square intermediate uncropped — apply the finetune crop on
                # device, or the crop silently vanishes from training
                crop_to=(tuple(dataset.adapter.out_size)
                         if getattr(dataset.adapter, "crop", False)
                         else None))
        fit(model, dataset, tcfg, total_steps=total, resume=True,
            validation_fn=validation_fn, augment_fn=augment_fn)

    elif cmd.mode in ("eval", "validation"):
        from m4depth_tpu.eval import (
            evaluate,
            metrics_to_validation_perfs,
            write_perfs,
        )

        dataset = build_dataset(cmd, "eval", db_paths, 1)
        cfg = model_config_from_args(cmd, depth_type=dataset.depth_type)
        model = build_model(cmd, cfg)
        val_state = val_epoch = None
        if cmd.mode == "validation":
            # restore ONCE and reuse for both eval and the best-ckpt backup:
            # re-reading "latest" after a long eval could pair this eval's
            # metrics with a newer epoch's weights
            from m4depth_tpu.train import create_train_state
            from m4depth_tpu.train.checkpoints import TrainCheckpointManager

            mgr = TrainCheckpointManager(os.path.join(cmd.ckpt_dir, "train"))
            if mgr.latest_epoch is None:
                # nothing trained yet: evaluating scratch-initialized params
                # would ledger untrained weights into ckpt_dir/best, which a
                # later --mode=eval would then silently load
                mgr.close()
                print("validation: no checkpoint in "
                      f"{os.path.join(cmd.ckpt_dir, 'train')}; nothing to "
                      "validate", flush=True)
                return 1
            val_state = create_train_state(model, jax.random.PRNGKey(0),
                                           init_sample(cmd))
            val_epoch = mgr.latest_epoch
            val_state = mgr.restore_latest(val_state)
            mgr.close()
            params = val_state.params
        else:
            params = restore_params_for_eval(cmd, model, init_sample(cmd),
                                             "best")
        trace = None
        if cmd.log_dir and cmd.mode == "eval":
            from m4depth_tpu.utils.profiling import TraceWindow

            # parity: profile_batch='10, 25' (main.py:122)
            trace = TraceWindow(cmd.log_dir, 10, 25)
        max_steps = (getattr(cmd, "validation_max_batches", 0)
                     if cmd.mode == "validation" else 0)
        metrics = evaluate(model, params, dataset, progress_every=500,
                           trace=trace, max_steps=max_steps)
        print({k: round(v, 4) for k, v in metrics.items()})

        if cmd.mode == "validation":
            from m4depth_tpu.train.checkpoints import BestCheckpointManager

            perfs = metrics_to_validation_perfs(metrics)
            best = BestCheckpointManager(
                os.path.join(cmd.ckpt_dir, "train"),
                os.path.join(cmd.ckpt_dir, "best"),
                keep_top_n=cmd.keep_top_n)
            best.update(val_epoch, perfs, val_state)
            line = "\t\t".join(
                format(metrics[k], ".4f")
                for k in ("AbsRel", "SqRel", "RMSE", "RMSE_log", "Delta1",
                          "Delta2", "Delta3"))
            with open(os.path.join(cmd.ckpt_dir, "validation-perfs.txt"),
                      "a") as f:
                f.write(line + "\n")
        else:
            path = write_perfs(metrics, cmd.ckpt_dir, cmd.dataset)
            print(f"metrics written to {path}")

    elif cmd.mode == "predict":
        import jax.numpy as jnp

        from m4depth_tpu.models import init_state

        dataset = build_dataset(cmd, "predict", db_paths, 1)
        cfg = model_config_from_args(cmd, depth_type=dataset.depth_type)
        model = build_model(cmd, cfg)
        params = restore_params_for_eval(cmd, model, init_sample(cmd), "best")


        @jax.jit
        def step(params, state, rgb, rot, trans, f, c, new_traj):
            from m4depth_tpu.geometry import Camera

            return model.apply(params, state, rgb, rot, trans,
                               Camera(f, c), new_traj,
                               method=type(model).step)

        trace = None
        if cmd.log_dir:
            from m4depth_tpu.utils.profiling import TraceWindow

            # parity: ProfilePredictCallback traces predict batches
            # (callbacks.py:24-67); same '10, 25' window as eval
            trace = TraceWindow(cmd.log_dir, 10, 25)

        model_state = None
        for i, frame in enumerate(dataset.frames()):
            if trace is not None:
                trace.on_step(i)
            if model_state is None:
                b, h, w = frame["rgb"].shape[:3]
                model_state = init_state(cfg, b, h, w)
            if i > 0 and frame["new_traj"][0]:
                print("End of trajectory")
            model_state, depth = step(
                params, model_state, jnp.asarray(frame["rgb"]),
                jnp.asarray(frame["rot"]), jnp.asarray(frame["trans"]),
                jnp.asarray(frame["camera_f"]), jnp.asarray(frame["camera_c"]),
                jnp.asarray(frame["new_traj"]))
            # depth[0] is the [h, w, 1] metric depth estimate for this frame;
            # downstream consumers hook in here (main.py:163-173).
            if cmd.output_dir:
                # 16-bit PNG export, depth*256 (the KITTI storage convention
                # and the legacy exporter's scheme,
                # .legacy/m4depth_pipeline.py:313-339)
                import cv2

                os.makedirs(cmd.output_dir, exist_ok=True)
                d16 = np.clip(np.asarray(depth[0, :, :, 0]) * 256.0,
                              0, 65535).astype(np.uint16)
                cv2.imwrite(
                    os.path.join(cmd.output_dir, f"depth_{i:06d}.png"), d16)
        if trace is not None:
            trace.close()  # streams shorter than the window still flush
    else:
        parser.print_help()
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

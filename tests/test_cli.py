"""End-to-end CLI smoke tests on a synthetic Mid-Air fixture (CPU, tiny)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def fixture_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("clidb")
    db = root / "db"
    records = root / "records"
    rng = np.random.RandomState(0)
    for t in range(2):
        os.makedirs(records / f"traj_{t}", exist_ok=True)
        os.makedirs(db / f"traj_{t}", exist_ok=True)
        lines = ["id\tcamera_l\tdisp\tqw\tqx\tqy\tqz\ttx\tty\ttz"]
        for i in range(6):
            img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            img_rel = f"traj_{t}/c_{i}.jpg"
            cv2.imwrite(str(db / img_rel), img)
            depth = rng.uniform(5, 50, (32, 32)).astype(np.float32)
            disp16 = (512.0 / depth).astype(np.float16)
            d_rel = f"traj_{t}/d_{i}.png"
            cv2.imwrite(str(db / d_rel), disp16.view(np.uint16))
            lines.append(
                f"{i}\t{img_rel}\t{d_rel}\t1\t0\t0\t0\t0.05\t0.01\t0.4")
        (records / f"traj_{t}" / "traj.csv").write_text("\n".join(lines))
    cfg = root / "datasets_location.json"
    cfg.write_text(json.dumps({"midair": str(db)}))
    return str(root), str(records), str(cfg)


class TestCliEval:
    def test_eval_mode_writes_perfs(self, fixture_env, tmp_path):
        root, records, cfg = fixture_env
        from m4depth_tpu.cli.main import main

        ckpt = str(tmp_path / "ckpt")
        rc = main([
            "--mode=eval", "--dataset=midair",
            f"--db_path_config={cfg}",
            f"--records_path={records}",
            f"--ckpt_dir={ckpt}",
            "--arch_depth=2", "--out_size", "32", "32",
            "--num_workers=2", "--compute_dtype=float32",
        ])
        assert rc == 0
        perfs = np.loadtxt(os.path.join(ckpt, "perfs-midair.txt"))
        assert perfs.shape == (7,)
        assert np.all(np.isfinite(perfs))

    def test_eval_v1_model_family(self, fixture_env, tmp_path):
        root, records, cfg = fixture_env
        from m4depth_tpu.cli.main import main

        ckpt = str(tmp_path / "ckpt_v1")
        rc = main([
            "--mode=eval", "--dataset=midair",
            f"--db_path_config={cfg}",
            f"--records_path={records}",
            f"--ckpt_dir={ckpt}",
            "--model=m4depth-v1",
            "--arch_depth=2", "--out_size", "32", "32",
            "--num_workers=2", "--compute_dtype=float32",
        ])
        assert rc == 0
        perfs = np.loadtxt(os.path.join(ckpt, "perfs-midair.txt"))
        assert np.all(np.isfinite(perfs))

    def test_predict_mode_runs(self, fixture_env, tmp_path):
        root, records, cfg = fixture_env
        from m4depth_tpu.cli.main import main

        rc = main([
            "--mode=predict", "--dataset=midair",
            f"--db_path_config={cfg}",
            f"--records_path={records}",
            f"--ckpt_dir={tmp_path / 'ckpt2'}",
            "--arch_depth=2", "--out_size", "32", "32",
            "--num_workers=2", "--compute_dtype=float32",
        ])
        assert rc == 0


class TestCliRecordStore:
    """convert verb + --record_store training/eval (legacy TFRecord-DB
    capability, .legacy/multi_gpu_pipeline/protobuf_db.py:287-358)."""

    def test_convert_train_eval_from_store(self, fixture_env, tmp_path):
        root, records, cfg = fixture_env
        from m4depth_tpu.cli.main import main

        store = str(tmp_path / "store")
        rc = main([
            "--mode=convert", "--dataset=midair",
            f"--db_path_config={cfg}",
            f"--records_path={records}",
            f"--record_store={store}",
            "--out_size", "32", "32", "--num_workers=2",
        ])
        assert rc == 0
        assert os.path.isfile(os.path.join(store, "index.json"))

        ckpt = str(tmp_path / "ckpt_store")
        rc = main([
            "--mode=train", "--dataset=midair",
            f"--db_path_config={cfg}",
            f"--record_store={store}",
            f"--ckpt_dir={ckpt}",
            "--db_seq_len=4", "--seq_len=2", "--batch_size=2",
            "--arch_depth=2", "--out_size", "32", "32",
            "--num_workers=2", "--compute_dtype=float32",
            "--total_steps=2",
        ])
        assert rc == 0

        rc = main([
            "--mode=eval", "--dataset=midair",
            f"--db_path_config={cfg}",
            f"--record_store={store}",
            f"--ckpt_dir={ckpt}",
            "--arch_depth=2", "--out_size", "32", "32",
            "--num_workers=2", "--compute_dtype=float32",
        ])
        assert rc == 0
        perfs = np.loadtxt(os.path.join(ckpt, "perfs-midair.txt"))
        assert np.all(np.isfinite(perfs))

    def test_predict_mode_traces_when_log_dir_set(self, fixture_env,
                                                  tmp_path):
        """Predict-mode device tracing (the reference's
        ProfilePredictCallback, callbacks.py:24-67): --log_dir must produce
        a profiler dump even when the stream ends inside the trace window."""
        root, records, cfg = fixture_env
        import glob as globlib

        from m4depth_tpu.cli.main import main

        logs = str(tmp_path / "predict_logs")
        rc = main([
            "--mode=predict", "--dataset=midair",
            f"--db_path_config={cfg}",
            f"--records_path={records}",
            f"--ckpt_dir={tmp_path / 'ckpt_pt'}",
            f"--log_dir={logs}",
            "--arch_depth=2", "--out_size", "32", "32",
            "--num_workers=2", "--compute_dtype=float32",
        ])
        assert rc == 0
        assert globlib.glob(os.path.join(logs, "plugins", "profile", "*"))

    def test_promote_without_best_fails(self, tmp_path):
        from m4depth_tpu.cli.main import main

        rc = main([
            "--mode=promote",
            f"--ckpt_dir={tmp_path / 'empty'}",
            f"--promote_dest={tmp_path / 'dest'}",
            "--arch_depth=2", "--compute_dtype=float32",
        ])
        assert rc == 1

    def test_validation_without_checkpoint_refuses(self, fixture_env,
                                                    tmp_path):
        """--mode=validation against an empty train dir must NOT evaluate
        scratch-initialized params and ledger them into ckpt_dir/best (a
        later --mode=eval would silently load the untrained weights)."""
        root, records, cfg = fixture_env
        from m4depth_tpu.cli.main import main

        ckpt = str(tmp_path / "fresh")
        rc = main([
            "--mode=validation", "--dataset=midair",
            f"--db_path_config={cfg}",
            f"--records_path={records}",
            f"--ckpt_dir={ckpt}",
            "--arch_depth=2", "--out_size", "32", "32",
            "--num_workers=2", "--compute_dtype=float32",
        ])
        assert rc == 1
        assert not os.path.exists(
            os.path.join(ckpt, "best", "validation_perfs.csv"))
        assert not os.path.exists(
            os.path.join(ckpt, "validation-perfs.txt"))

    def test_promote_resaves_best_under_train_naming(self, tmp_path):
        """CLI promote verb: a best checkpoint created by the validation
        path must become visible to TrainCheckpointManager.latest_step in
        the destination (reference best->train move,
        scripts/1b-finetune-kitti.sh:5-11)."""
        import jax

        from m4depth_tpu.cli.main import build_model, init_sample, main
        from m4depth_tpu.cli.options import (
            build_parser,
            model_config_from_args,
        )
        from m4depth_tpu.train import create_train_state
        from m4depth_tpu.train.checkpoints import (
            BestCheckpointManager,
            TrainCheckpointManager,
        )
        import argparse

        flags = ["--arch_depth=2", "--compute_dtype=float32"]
        parser = build_parser(argparse.ArgumentParser())
        cmd, _ = parser.parse_known_args(flags)
        model = build_model(cmd, model_config_from_args(cmd))
        state = create_train_state(model, jax.random.PRNGKey(3),
                                   init_sample(cmd))
        src = str(tmp_path / "src")
        best = BestCheckpointManager(
            os.path.join(src, "train"), os.path.join(src, "best"))
        best.update(7, {"abs_rel": 0.3, "sq_rel": 0.1, "rmse": 1.0,
                        "rmsel": 0.2, "a1": 0.9, "a2": 0.95, "a3": 0.99},
                    state)

        dest = str(tmp_path / "dest")
        rc = main(["--mode=promote", f"--ckpt_dir={src}",
                   f"--promote_dest={dest}"] + flags)
        assert rc == 0
        mgr = TrainCheckpointManager(os.path.join(dest, "train"))
        assert mgr.latest_epoch == 7
        restored = mgr.restore_latest(state)
        np.testing.assert_allclose(
            np.array(jax.tree_util.tree_leaves(restored.params)[0]),
            np.array(jax.tree_util.tree_leaves(state.params)[0]))
        mgr.close()

    def test_convert_requires_out_dir(self, fixture_env):
        root, records, cfg = fixture_env
        import pytest as _pytest

        from m4depth_tpu.cli.main import main

        with _pytest.raises(SystemExit):
            main(["--mode=convert", "--dataset=midair",
                  f"--db_path_config={cfg}", f"--records_path={records}"])

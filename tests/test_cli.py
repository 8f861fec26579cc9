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

    def test_convert_requires_out_dir(self, fixture_env):
        root, records, cfg = fixture_env
        import pytest as _pytest

        from m4depth_tpu.cli.main import main

        with _pytest.raises(SystemExit):
            main(["--mode=convert", "--dataset=midair",
                  f"--db_path_config={cfg}", f"--records_path={records}"])

"""Integration test: fit() end-to-end on a synthetic in-memory dataset."""

import os

import numpy as np
import pytest

from m4depth_tpu.config import ModelConfig, TrainConfig
from m4depth_tpu.models import M4Depth
from m4depth_tpu.train.loop import NaNStop, fit


class SyntheticDataset:
    """Minimal dataset interface for fit(): batches(epoch) + len + batch_size."""

    def __init__(self, n_batches=3, b=2, T=2, h=16, w=16, poison=False):
        self.n = n_batches
        self.batch_size = b
        self.shape = (b, T, h, w)
        self.poison = poison
        self.rng = np.random.RandomState(0)

    def __len__(self):
        return self.n

    def batches(self, epoch=0):
        b, T, h, w = self.shape
        for i in range(self.n):
            rot = np.tile(np.array([1.0, 0, 0, 0], np.float32), (b, T, 1))
            depth = self.rng.uniform(5, 50, (b, T, h, w, 1)).astype(np.float32)
            if self.poison:
                depth = depth * np.nan
            yield {
                "rgb": self.rng.rand(b, T, h, w, 3).astype(np.float32),
                "depth": depth,
                "rot": rot,
                "trans": np.tile(np.array([0.05, 0, 0.4], np.float32),
                                 (b, T, 1)),
                "camera_f": np.full((b, 2), 8.0, np.float32),
                "camera_c": np.full((b, 2), 8.0, np.float32),
            }


def tiny_model():
    return M4Depth(ModelConfig(
        num_levels=2,
        encoder_channels=(8, 12),
        refiner_prep_channels=(16, 16, 8),
        refiner_est_channels=(8, 8, 5),
    ))


class TestFit:
    def test_trains_saves_and_resumes(self, tmp_path):
        ds = SyntheticDataset(n_batches=2)
        cfg = TrainConfig(ckpt_dir=str(tmp_path / "ckpt"),
                          log_dir=str(tmp_path / "logs"),
                          learning_rate=1e-3, summary_interval=1)
        model = tiny_model()
        state = fit(model, ds, cfg, total_steps=4, nan_check_every=1,
                    log_every=2)
        assert int(state.step) == 4  # 2 epochs x 2 batches
        assert os.path.isfile(os.path.join(tmp_path, "logs", "metrics.jsonl"))

        # resume: one more epoch's worth of steps
        state2 = fit(model, ds, cfg, total_steps=6, nan_check_every=1)
        assert int(state2.step) == 6

    def test_indivisible_batch_falls_back_on_hybrid_mesh(self, tmp_path):
        """Batch 3 on the 8-device (2,4) hybrid ('dcn','ici') mesh: the
        shrink fallback builds a 1-D mesh, so it must keep only one axis
        name — make_mesh((3,), ('dcn','ici')) used to raise ValueError."""
        ds = SyntheticDataset(n_batches=2, b=3)
        cfg = TrainConfig(ckpt_dir=str(tmp_path / "ckpt"),
                          log_dir=str(tmp_path / "logs"),
                          mesh_shape=(2, 4), mesh_axes=("dcn", "ici"),
                          learning_rate=1e-3, summary_interval=1)
        state = fit(tiny_model(), ds, cfg, total_steps=2, nan_check_every=1,
                    log_every=2)
        assert int(state.step) == 2

    def test_nan_tripwire_refuses_to_save(self, tmp_path):
        ds = SyntheticDataset(n_batches=2, poison=True)
        cfg = TrainConfig(ckpt_dir=str(tmp_path / "ckpt"),
                          learning_rate=1e-3)
        model = tiny_model()
        with pytest.raises(NaNStop):
            fit(model, ds, cfg, total_steps=2, nan_check_every=1)
        # no checkpoint may exist
        train_dir = os.path.join(tmp_path, "ckpt", "train")
        steps = [d for d in os.listdir(train_dir)
                 if d.isdigit()] if os.path.isdir(train_dir) else []
        assert steps == []

    def test_validation_hook_feeds_best_manager(self, tmp_path):
        ds = SyntheticDataset(n_batches=2)
        cfg = TrainConfig(ckpt_dir=str(tmp_path / "ckpt"),
                          learning_rate=1e-3)
        model = tiny_model()
        calls = []

        def fake_validation(params):
            calls.append(1)
            return {"abs_rel": 0.5 / len(calls), "sq_rel": 0.1, "rmse": 1.0,
                    "rmsel": 0.2, "a1": 0.9, "a2": 0.95, "a3": 0.99}

        fit(model, ds, cfg, total_steps=4, validation_fn=fake_validation,
            nan_check_every=1)
        assert len(calls) == 2
        assert os.path.isfile(
            os.path.join(tmp_path, "ckpt", "best", "validation_perfs.csv"))

    def test_train_validate_promote_finetune_e2e(self, tmp_path):
        """Full promotion chain (the reference's best->train move,
        scripts/1b-finetune-kitti.sh:5-11): train with validation so a best
        checkpoint exists, promote it into a fresh finetune dir, then assert
        the finetune fit() resumes from the PROMOTED params — not a scratch
        init (the round-2 silent failure mode)."""
        import jax

        from m4depth_tpu.train import create_train_state
        from m4depth_tpu.train.checkpoints import promote_best_to_train

        ds = SyntheticDataset(n_batches=2)
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        model = tiny_model()

        def fake_validation(params):
            return {"abs_rel": 0.5, "sq_rel": 0.1, "rmse": 1.0,
                    "rmsel": 0.2, "a1": 0.9, "a2": 0.95, "a3": 0.99}

        cfg = TrainConfig(ckpt_dir=src, learning_rate=1e-3)
        trained = fit(model, ds, cfg, total_steps=2, nan_check_every=1,
                      validation_fn=fake_validation)

        sample = next(ds.batches(0))
        abstract = create_train_state(model, jax.random.PRNGKey(0), sample)
        epoch = promote_best_to_train(
            os.path.join(src, "best"), os.path.join(dst, "train"), abstract)
        assert epoch == 0

        # finetune with lr=0: params can only equal the trained ones if the
        # promoted checkpoint was actually restored (a scratch init with the
        # same seed would reproduce the UNtrained init instead)
        cfg2 = TrainConfig(ckpt_dir=dst, learning_rate=0.0)
        finetuned = fit(model, ds, cfg2, total_steps=4, nan_check_every=1)
        assert int(finetuned.step) == int(trained.step) + 2
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.array(a), np.array(b), atol=1e-6),
            finetuned.params, trained.params)

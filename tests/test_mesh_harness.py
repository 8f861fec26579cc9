"""The FULL training harness on the 8-device CPU mesh.

tests/test_sharding.py proves one sharded train STEP; this proves the
HARNESS — ``train/loop.py::fit`` with rolling Orbax checkpoints, sync
validation feeding the BestCheckpointManager majority vote, and a
kill/resume cycle — is mesh-clean end-to-end (VERDICT r4 next #6).
Reference capability being covered: legacy multi-GPU training,
.legacy/multi_gpu_pipeline/feedforward_pipeline.py:141-256 (towers +
session-loop + per-scope savers); here the mesh is the tower set and
Orbax restores the sharded train state.
"""

import os

import numpy as np
import jax

from m4depth_tpu.config import ModelConfig, TrainConfig
from m4depth_tpu.data.synthetic import SyntheticGeometricDataset
from m4depth_tpu.models import M4Depth
from m4depth_tpu.train.loop import fit


def tiny_model():
    return M4Depth(ModelConfig(
        num_levels=2,
        encoder_channels=(8, 12),
        refiner_prep_channels=(16, 16, 8),
        refiner_est_channels=(8, 8, 5),
    ))


def make_cfg(tmp_path, total_steps):
    return TrainConfig(
        learning_rate=1e-3, total_steps=total_steps, seed=0,
        ckpt_dir=str(tmp_path / "ckpt"), log_dir=None,
        keep_last_n=3, keep_top_n=2, summary_interval=1000)


class FakeValidator:
    """Sync validation returning improving-then-worsening perfs so the
    majority vote both accepts and rejects a candidate."""

    def __init__(self):
        self.calls = 0
        # epoch 0: mediocre; epoch 1: better on all 7; epoch 2: worse on all
        self.script = [
            dict(abs_rel=0.3, sq_rel=0.3, rmse=3.0, rmsel=0.3,
                 a1=0.5, a2=0.7, a3=0.8),
            dict(abs_rel=0.2, sq_rel=0.2, rmse=2.0, rmsel=0.2,
                 a1=0.6, a2=0.8, a3=0.9),
            dict(abs_rel=0.9, sq_rel=0.9, rmse=9.0, rmsel=0.9,
                 a1=0.1, a2=0.2, a3=0.3),
        ]

    def __call__(self, params):
        perfs = self.script[min(self.calls, len(self.script) - 1)]
        self.calls += 1
        return perfs


def params_allclose(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


def test_fit_on_eight_device_mesh_with_resume(tmp_path):
    assert jax.device_count() >= 8
    ds = SyntheticGeometricDataset(n_batches=4, batch_size=8, T=2,
                                   h=16, w=16, seed=3)
    model = tiny_model()
    spe = len(ds)
    validator = FakeValidator()

    # phase 1: two epochs through the full harness on the mesh
    cfg = make_cfg(tmp_path, total_steps=2 * spe)
    state1 = fit(model, ds, cfg, resume=True, validation_fn=validator,
                 log_every=1000)
    assert int(state1.step) == 2 * spe
    assert validator.calls == 2
    # rolling checkpoints + best-K artifacts exist
    train_dir = os.path.join(cfg.ckpt_dir, "train")
    best_dir = os.path.join(cfg.ckpt_dir, "best")
    assert os.path.isdir(train_dir)
    assert os.path.isfile(os.path.join(best_dir, "validation_perfs.csv"))
    backed_up = [d for d in os.listdir(best_dir) if d.startswith("ckpt-")]
    assert backed_up, "best-K manager backed up nothing"

    # phase 2: relaunch at the SAME budget — fit must restore the final
    # sharded state from disk and return it without training further (the
    # resume path itself, under the mesh)
    state2 = fit(model, ds, make_cfg(tmp_path, 2 * spe), resume=True,
                 log_every=1000)
    assert int(state2.step) == int(state1.step)
    params_allclose(state1.params, state2.params)
    params_allclose(state1.opt_state, state2.opt_state)

    # phase 3: a larger budget resumes from epoch 2 and keeps training on
    # the mesh (the post-kill continue), with validation live again
    state3 = fit(model, ds, make_cfg(tmp_path, 3 * spe), resume=True,
                 validation_fn=validator, log_every=1000)
    assert int(state3.step) == 3 * spe
    assert validator.calls == 3
    # the worse epoch-2 perfs must NOT have displaced the epoch-1 winner
    import pandas as pd

    ledger = pd.read_csv(os.path.join(best_dir, "validation_perfs.csv"))
    assert (ledger["abs_rel"] < 0.9).any()

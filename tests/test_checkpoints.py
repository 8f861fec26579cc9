"""Checkpoint managers: rolling save/restore + best-K majority vote."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from m4depth_tpu.train.checkpoints import (
    BestCheckpointManager,
    TrainCheckpointManager,
    promote_best_to_train,
)


def tiny_state():
    import optax
    from flax.training.train_state import TrainState

    params = {"w": jnp.arange(4.0), "b": jnp.ones((2, 2))}
    return TrainState.create(
        apply_fn=lambda *a: None, params=params, tx=optax.sgd(0.1))


def perfs(abs_rel, a1):
    return {"abs_rel": abs_rel, "sq_rel": abs_rel, "rmse": abs_rel,
            "rmsel": abs_rel, "a1": a1, "a2": a1, "a3": a1}


class TestTrainCheckpointManager:
    def test_roundtrip_and_resume_epoch(self, tmp_path):
        mgr = TrainCheckpointManager(str(tmp_path / "train"), max_keep=2)
        assert mgr.resume_epoch == 0
        state = tiny_state()
        state = state.replace(step=7)
        mgr.save(3, state)
        assert mgr.resume_epoch == 4
        restored = mgr.restore_latest(tiny_state())
        assert int(restored.step) == 7
        np.testing.assert_allclose(
            np.array(restored.params["w"]), np.arange(4.0))
        mgr.close()

    def test_max_keep_prunes(self, tmp_path):
        mgr = TrainCheckpointManager(str(tmp_path / "train"), max_keep=2)
        state = tiny_state()
        for e in range(4):
            mgr.save(e, state)
        assert mgr.latest_epoch == 3
        steps = sorted(mgr._mgr.all_steps())
        assert steps == [2, 3]
        mgr.close()


class TestBestCheckpointManager:
    def test_first_backup_always_kept(self, tmp_path):
        best = BestCheckpointManager(str(tmp_path / "t"), str(tmp_path / "b"),
                                     keep_top_n=1)
        assert best.update(0, perfs(0.5, 0.5), tiny_state())
        assert best.best_checkpoint_name() == "ckpt-0000"

    def test_majority_vote_replacement(self, tmp_path):
        best = BestCheckpointManager(str(tmp_path / "t"), str(tmp_path / "b"),
                                     keep_top_n=1)
        best.update(0, perfs(0.5, 0.5), tiny_state())
        # strictly better on all 7 -> replaces
        assert best.update(1, perfs(0.4, 0.6), tiny_state())
        assert best.best_checkpoint_name() == "ckpt-0001"
        # strictly worse on all 7 -> rejected
        assert not best.update(2, perfs(0.9, 0.1), tiny_state())
        assert best.best_checkpoint_name() == "ckpt-0001"

    def test_mixed_vote_needs_majority(self, tmp_path):
        best = BestCheckpointManager(str(tmp_path / "t"), str(tmp_path / "b"),
                                     keep_top_n=1)
        best.update(0, perfs(0.5, 0.5), tiny_state())
        # better on the 4 error metrics, worse on the 3 accuracies: 4 > 3 wins
        assert best.update(1, perfs(0.4, 0.4), tiny_state())
        # better on 3 accuracies only: 3 of 7, not a majority
        assert not best.update(2, perfs(0.45, 0.9), tiny_state())

    def test_top_n_keeps_multiple(self, tmp_path):
        best = BestCheckpointManager(str(tmp_path / "t"), str(tmp_path / "b"),
                                     keep_top_n=2)
        best.update(0, perfs(0.5, 0.5), tiny_state())
        best.update(1, perfs(0.6, 0.4), tiny_state())  # fills slot 2
        import pandas as pd

        ledger = pd.read_csv(best.ledger_path)
        assert ledger.shape[0] == 2

    def test_selection_uses_majority_vote_not_abs_rel(self, tmp_path):
        """Crafted ledger where the vote and abs_rel disagree: entry B has the
        lowest abs_rel but loses 5 of 7 metrics to entry A — the vote must
        pick A (selection consistent with entry/eviction semantics,
        callbacks.py:216-227)."""
        best = BestCheckpointManager(str(tmp_path / "t"), str(tmp_path / "b"),
                                     keep_top_n=2)
        a = {"abs_rel": 0.50, "sq_rel": 0.30, "rmse": 3.0, "rmsel": 0.30,
             "a1": 0.90, "a2": 0.95, "a3": 0.99}
        bm = {"abs_rel": 0.40, "sq_rel": 0.35, "rmse": 3.5, "rmsel": 0.35,
              "a1": 0.85, "a2": 0.90, "a3": 0.95}
        best.update(0, a, tiny_state())
        best.update(1, bm, tiny_state())  # fills slot 2, no vote needed
        assert best.best_checkpoint_name() == "ckpt-0000"

    def test_selection_ties_go_to_newest(self, tmp_path):
        """Equal vote standings: the newest entry wins, matching the
        reference's checkpoint index file (callbacks.py:237-239)."""
        best = BestCheckpointManager(str(tmp_path / "t"), str(tmp_path / "b"),
                                     keep_top_n=2)
        best.update(0, perfs(0.5, 0.5), tiny_state())
        best.update(1, perfs(0.5, 0.5), tiny_state())  # identical: 0-0 vote
        assert best.best_checkpoint_name() == "ckpt-0001"

    def test_plain_copy_is_invisible_to_train_manager(self, tmp_path):
        """The bug promote_best_to_train exists to fix: cp -r of a best dir
        (StandardCheckpointer ckpt-NNNN layout) into a train dir leaves
        latest_step() == None, so a resume would silently start from
        scratch."""
        import shutil

        best = BestCheckpointManager(str(tmp_path / "t"), str(tmp_path / "b"),
                                     keep_top_n=1)
        best.update(5, perfs(0.3, 0.8), tiny_state())
        shutil.copytree(str(tmp_path / "b"), str(tmp_path / "copied-train"))
        mgr = TrainCheckpointManager(str(tmp_path / "copied-train"))
        assert mgr.latest_epoch is None  # the silent-no-op failure mode
        mgr.close()

    def test_promote_best_to_train(self, tmp_path):
        best = BestCheckpointManager(str(tmp_path / "t"), str(tmp_path / "b"),
                                     keep_top_n=1)
        state = tiny_state().replace(step=42)
        state = state.replace(
            params={"w": jnp.full(4, 7.0), "b": jnp.ones((2, 2))})
        best.update(5, perfs(0.3, 0.8), state)

        epoch = promote_best_to_train(
            str(tmp_path / "b"), str(tmp_path / "dest" / "train"),
            tiny_state())
        assert epoch == 5

        mgr = TrainCheckpointManager(str(tmp_path / "dest" / "train"))
        assert mgr.latest_epoch == 5
        assert mgr.resume_epoch == 6
        restored = mgr.restore_latest(tiny_state())
        assert int(restored.step) == 42
        np.testing.assert_allclose(np.array(restored.params["w"]),
                                   np.full(4, 7.0))
        mgr.close()

    def test_promote_without_best_returns_none(self, tmp_path):
        assert promote_best_to_train(
            str(tmp_path / "missing"), str(tmp_path / "train"),
            tiny_state()) is None

    def test_same_epoch_revalidation_replaces_row_in_place(self, tmp_path):
        """Backup dirs are keyed by epoch: a second update() for an
        already-ledgered epoch must replace that row, not append a second
        row aliasing the same directory (whose later eviction would delete
        the weights both rows reference)."""
        import os

        import pandas as pd

        best = BestCheckpointManager(str(tmp_path / "t"), str(tmp_path / "b"),
                                     keep_top_n=2)
        best.update(0, perfs(0.5, 0.5), tiny_state())
        best.update(1, perfs(0.6, 0.4), tiny_state())
        # re-validate epoch 1 with different metrics and weights
        state2 = tiny_state().replace(step=99)
        assert best.update(1, perfs(0.45, 0.55), state2)
        ledger = pd.read_csv(best.ledger_path)
        assert ledger.shape[0] == 2  # replaced, not appended
        assert sorted(ledger["ckpt_name"]) == ["ckpt-0000", "ckpt-0001"]
        row = ledger[ledger["ckpt_name"] == "ckpt-0001"].iloc[0]
        assert row["abs_rel"] == pytest.approx(0.45)  # new metrics
        # both directories exist and the winner restores cleanly
        for name in ledger["ckpt_name"]:
            assert os.path.isdir(os.path.join(str(tmp_path / "b"), name))
        assert best.best_checkpoint_name() == "ckpt-0001"
        assert int(best.restore_best(tiny_state()).step) == 99

    def test_restore_best(self, tmp_path):
        best = BestCheckpointManager(str(tmp_path / "t"), str(tmp_path / "b"),
                                     keep_top_n=1)
        state = tiny_state().replace(step=42)
        best.update(0, perfs(0.3, 0.8), state)
        restored = best.restore_best(tiny_state())
        assert int(restored.step) == 42

"""Checkpointing: rolling training checkpoints + best-K backup manager.

Parity reference:
  * ``CustomCheckpointCallback`` (callbacks.py:69-132) — restore latest on
    start, save per epoch, keep the last ``max_keep``, refuse to save after a
    NaN stop. Implemented on Orbax (async-capable, TPU-friendly layout).
  * ``BestCheckpointManager`` (callbacks.py:173-240) — keep the top-N weight
    sets by majority vote over 7 validation metrics (4 lower-is-better, 3
    higher-is-better) with a CSV ledger.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp
import pandas as pd

LOWER_IS_BETTER = ("abs_rel", "sq_rel", "rmse", "rmsel")
HIGHER_IS_BETTER = ("a1", "a2", "a3")


class TrainCheckpointManager:
    """Rolling checkpoint store for the train state (params+opt+step)."""

    def __init__(self, directory: str, max_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_keep, create=True),
        )

    @property
    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    @property
    def resume_epoch(self) -> int:
        """First epoch to run (parity: resume-epoch parsing, callbacks.py:90)."""
        latest = self._mgr.latest_step()
        return 0 if latest is None else latest + 1

    def save(self, epoch: int, state: Any) -> None:
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore_latest(self, abstract_state: Any) -> Any:
        """Restore into the structure of ``abstract_state`` (a concrete state
        works too — its arrays are used as shape/dtype/sharding targets)."""
        latest = self._mgr.latest_step()
        if latest is None:
            return abstract_state
        template = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, abstract_state)
        return self._mgr.restore(
            latest, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()


class BestCheckpointManager:
    """Top-N backup by majority vote across validation metrics.

    A candidate replaces an existing entry when strictly more than half of
    the 7 metrics improve (>3 of 7, as the reference counts it).
    """

    def __init__(self, train_dir: str, best_dir: str, keep_top_n: int = 1):
        self.train_dir = os.path.abspath(train_dir)
        self.best_dir = os.path.abspath(best_dir)
        self.keep_top_n = keep_top_n
        os.makedirs(self.best_dir, exist_ok=True)
        self.ledger_path = os.path.join(self.best_dir, "validation_perfs.csv")

    @staticmethod
    def _wins(candidate: Dict[str, float], incumbent: pd.Series) -> int:
        n = 0
        for m in LOWER_IS_BETTER:
            n += int(incumbent[m] > candidate[m])
        for m in HIGHER_IS_BETTER:
            n += int(incumbent[m] < candidate[m])
        return n

    def _backup(self, epoch: int, state: Any) -> str:
        ckpter = ocp.StandardCheckpointer()
        path = os.path.join(self.best_dir, f"ckpt-{epoch:04d}")
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        ckpter.save(path, state)
        ckpter.wait_until_finished()
        ckpter.close()
        return f"ckpt-{epoch:04d}"

    def _remove(self, name: str) -> None:
        import shutil

        path = os.path.join(self.best_dir, str(name))
        if os.path.exists(path):
            shutil.rmtree(path)

    def update(self, epoch: int, perfs: Dict[str, float], state: Any) -> bool:
        """Consider (epoch, perfs); back up the state if it makes the top-N.

        perfs keys: abs_rel, sq_rel, rmse, rmsel, a1, a2, a3.
        Returns True if a backup was made.
        """
        row = {k: float(v) for k, v in perfs.items()}
        if not os.path.isfile(self.ledger_path):
            row["ckpt_name"] = self._backup(epoch, state)
            pd.DataFrame([row]).to_csv(self.ledger_path, index=False)
            return True

        ledger = pd.read_csv(self.ledger_path)
        dup = ledger.index[ledger["ckpt_name"] == f"ckpt-{epoch:04d}"]
        if len(dup):
            # Same-epoch re-validation: backup dirs are keyed by epoch, so a
            # second row would alias the first's directory and a later
            # eviction of either would delete the weights both rows
            # reference. Replace the row in place — the overwritten backup
            # now holds this state, so its metrics must describe it.
            row["ckpt_name"] = self._backup(epoch, state)
            for k, v in row.items():
                ledger.loc[dup[0], k] = v
            ledger.to_csv(self.ledger_path, index=False)
            return True
        if ledger.shape[0] < self.keep_top_n:
            row["ckpt_name"] = self._backup(epoch, state)
            ledger = pd.concat([ledger, pd.DataFrame([row])],
                               ignore_index=True)
            ledger.to_csv(self.ledger_path, index=False)
            return True

        for i in range(ledger.shape[0]):
            if self._wins(row, ledger.iloc[i]) > 3:
                row["ckpt_name"] = self._backup(epoch, state)
                ledger = pd.concat([ledger, pd.DataFrame([row])],
                                   ignore_index=True)
                if ledger.shape[0] > self.keep_top_n:
                    self._remove(ledger["ckpt_name"].iloc[i])
                    ledger = ledger.drop([i]).reset_index(drop=True)
                ledger.to_csv(self.ledger_path, index=False)
                return True
        return False

    def best_checkpoint_name(self) -> Optional[str]:
        """Pick the ledger entry that majority-vote-beats the most others.

        Entry/eviction uses the >3-of-7 vote (callbacks.py:216-227); selection
        uses the same vote as a round-robin tournament so restore_best can
        never return a checkpoint the vote would reject. Ties go to the newer
        entry — the reference's ``checkpoint`` index file always points at the
        newest accepted backup (callbacks.py:237-239).
        """
        if not os.path.isfile(self.ledger_path):
            return None
        ledger = pd.read_csv(self.ledger_path)
        if ledger.empty:
            return None
        n = ledger.shape[0]
        best_idx, best_wins = n - 1, -1
        for i in range(n):
            row = {k: float(ledger.iloc[i][k])
                   for k in LOWER_IS_BETTER + HIGHER_IS_BETTER}
            wins = sum(
                self._wins(row, ledger.iloc[j]) > 3
                for j in range(n) if j != i)
            if wins >= best_wins:  # >= : newer entry wins ties
                best_idx, best_wins = i, wins
        return str(ledger["ckpt_name"].iloc[best_idx])

    def restore_best(self, abstract_state: Any) -> Optional[Any]:
        name = self.best_checkpoint_name()
        if name is None:
            return None
        template = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, abstract_state)
        ckpter = ocp.StandardCheckpointer()
        out = ckpter.restore(os.path.join(self.best_dir, name), template)
        ckpter.close()
        return out


def promote_best_to_train(best_dir: str, train_dir: str, abstract_state: Any,
                          keep_top_n: int = 1) -> Optional[int]:
    """Re-save the ledger-winning best checkpoint under the train manager's
    integer-step naming so a later run (finetune) resumes from it.

    A plain ``cp -r best train`` does NOT work: the best dir holds
    ``StandardCheckpointer`` dirs named ``ckpt-NNNN`` while
    ``TrainCheckpointManager`` is an Orbax ``CheckpointManager`` expecting
    integer step dirs — ``latest_step()`` on a copied dir returns ``None``
    and finetuning silently starts from scratch, exactly the failure the
    reference's promote step exists to prevent
    (scripts/1b-finetune-kitti.sh:5-11).

    Returns the promoted epoch, or ``None`` when there is no best checkpoint.
    """
    best = BestCheckpointManager(train_dir, best_dir, keep_top_n=keep_top_n)
    name = best.best_checkpoint_name()
    if name is None:
        return None
    state = best.restore_best(abstract_state)
    epoch = int(str(name).rsplit("-", 1)[-1])
    mgr = TrainCheckpointManager(train_dir)
    mgr.save(epoch, state)
    mgr.close()
    return epoch

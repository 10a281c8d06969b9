"""Checkpointing — one Orbax-backed manager replacing the reference's
three coexisting schemes (SURVEY.md §5.4: epoch tarballs
data_utils.py:256-311, best-metric ``_ModelCheckpoint``
training_utils.py:246-345, DiffEEG step checkpoints DiffEEG_train.py:87-103).

Layout under ``ckpt_dir``::

    step_<n>/        periodic full TrainState snapshots (resume points)
    best-<metric>/   best-so-far snapshot, metric-gated (min or max)
    last/            final snapshot
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, ckpt_metric: str = "kldiv",
                 ckpt_mode: str = "min", keep: int = 3) -> None:
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.ckpt_metric = ckpt_metric
        self.direction = -1.0 if ckpt_mode == "max" else 1.0
        self.best_score = float("inf")
        self.best_epoch = -1
        self.keep = keep
        self._ckpt = ocp.StandardCheckpointer()

    # -- low-level ---------------------------------------------------------

    def _save(self, name: str, state: Any, meta: Optional[Dict] = None):
        path = os.path.join(self.ckpt_dir, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckpt.save(path, state)
        self._ckpt.wait_until_finished()
        if meta is not None:
            with open(os.path.join(self.ckpt_dir, f"{name}.json"), "w") as f:
                json.dump(meta, f)

    def restore(self, name: str, abstract_state: Any) -> Any:
        """Restore a snapshot into the structure of ``abstract_state``."""
        path = os.path.join(self.ckpt_dir, name)
        return self._ckpt.restore(path, abstract_state)

    # -- policy ------------------------------------------------------------

    def step(self, epoch: int, state: Any, val_result: Dict[str, float],
             last_epoch: bool = False) -> bool:
        """Metric-gated best-checkpoint update (reference
        ``_ModelCheckpoint.step``, training_utils.py:270-294).  Returns
        True if the best checkpoint was refreshed."""
        score = val_result[self.ckpt_metric] * self.direction
        improved = score < self.best_score
        if improved:
            self.best_score = score
            self.best_epoch = epoch
            self._save(f"best-{self.ckpt_metric}", state,
                       {"epoch": epoch, **val_result})
        if last_epoch:
            self._save("last", state, {"epoch": epoch, **val_result})
        return improved

    def save_step(self, step: int, state: Any,
                  meta: Optional[Dict] = None) -> None:
        """Periodic step snapshot (DiffEEG save_and_sample_every,
        DiffEEG_train.py:172-176), pruning old ones."""
        self._save(f"step_{step}", state, meta or {"step": step})
        steps = sorted(
            (int(d.split("_")[1]) for d in os.listdir(self.ckpt_dir)
             if d.startswith("step_") and not d.endswith(".json")))
        for old in steps[:-self.keep]:
            shutil.rmtree(os.path.join(self.ckpt_dir, f"step_{old}"),
                          ignore_errors=True)
            meta_f = os.path.join(self.ckpt_dir, f"step_{old}.json")
            if os.path.exists(meta_f):
                os.remove(meta_f)

    def divert_on_change(self, hyperparams: Dict[str, Any]) -> "CheckpointManager":
        """Hyperparameter-change guard (reference
        ``detect_and_save_checkpoint``, data_utils.py:291-311): the
        reference renames the checkpoint file when the optimizer type or
        regularization lambda differs from the last run so resume never
        mixes incompatible training states.  Here the fingerprint of the
        run's hyperparameters is stored alongside the stream; on mismatch
        the manager diverts to a fresh ``<dir>_<changed-keys>-<hash>``
        directory (and records the new fingerprint there) instead of
        resuming.  The suffix hashes the full fingerprint VALUES, so two
        runs that differ from the base stream in the same key but with
        different values land in different streams (they must not mix
        training states), while re-running an identical fingerprint is
        stable (same directory every time)."""
        blob = json.dumps(hyperparams, sort_keys=True, default=repr)
        path = os.path.join(self.ckpt_dir, "hyperparams.json")
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(blob)
            return self
        with open(path) as f:
            prev = json.load(f)
        cur = json.loads(blob)        # JSON-normalized (tuples→lists, …)
        changed = sorted(k for k in set(prev) | set(cur)
                         if prev.get(k) != cur.get(k))
        if not changed:
            return self
        tag = hashlib.sha1(blob.encode()).hexdigest()[:6]
        fresh = CheckpointManager(
            f"{self.ckpt_dir}_{'_'.join(changed)}-{tag}", self.ckpt_metric,
            "max" if self.direction < 0 else "min", self.keep)
        with open(os.path.join(fresh.ckpt_dir, "hyperparams.json"),
                  "w") as f:
            f.write(blob)
        return fresh

    def load_meta(self, name: str) -> Optional[Dict]:
        """Sidecar metadata saved alongside a snapshot (epoch counter,
        history, best-score bookkeeping — the resume payload of the
        reference's epoch tarballs, data_utils.py:256-311)."""
        path = os.path.join(self.ckpt_dir, f"{name}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def latest_step(self) -> Optional[int]:
        steps = [int(d.split("_")[1]) for d in os.listdir(self.ckpt_dir)
                 if d.startswith("step_") and not d.endswith(".json")]
        return max(steps) if steps else None

    def load_best(self, abstract_state: Any) -> Any:
        """Best-checkpoint reload for final eval (training_utils.py:319-330)."""
        return self.restore(f"best-{self.ckpt_metric}", abstract_state)

"""Epoch-loop trainer (reference ``_BaseTrainer``/``MainTrainer``,
training_utils.py:350-736): epoch loop → jitted train steps → jitted eval
→ LR schedule step (per-batch or per-epoch, incl. plateau) → metric-gated
checkpointing → final eval with the best checkpoint.

The data interface is a host-side iterator of numpy batch dicts
({"x"| "eeg"+"spec", "y"}) — see :mod:`..data.loader` for the pipelines.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import CheckpointManager
from .metrics import Evaluator
from .schedules import ReduceLROnPlateau
from .state import TrainState, set_learning_rate
from .steps import make_eval_step, make_train_step

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 50
    ckpt_metric: str = "kldiv"
    ckpt_mode: str = "min"
    es_patience: int = 0              # 0 → no early stop (cfg_utils.py:124)
    step_per_batch: bool = True
    l2_lambda: float = 0.0
    lr_schedule: Optional[Callable[[int], float]] = None   # step/epoch → lr
    plateau: Optional[ReduceLROnPlateau] = None
    eval_metrics: tuple = ("kldiv", "ce", "accuracy", "f1")
    log_every: int = 50
    seed: int = 42
    #: resume from the latest epoch snapshot under ckpt_dir (the
    #: reference's ``load_checkpoint`` start_epoch + history resume,
    #: data_utils.py:256-311)
    resume: bool = False
    #: extra run-identity keys (e.g. optimizer name, lr) merged with
    #: l2_lambda into the checkpoint stream's hyperparameter fingerprint;
    #: on mismatch with an existing stream the manager diverts to a fresh
    #: directory (reference detect_and_save_checkpoint,
    #: data_utils.py:291-311)
    hyperparams: Optional[Dict[str, Any]] = None


class Trainer:
    def __init__(self, state: TrainState, cfg: TrainerConfig,
                 ckpt_dir: Optional[str] = None,
                 loggers: Optional[List[Any]] = None,
                 epoch_callbacks: Optional[List[Any]] = None,
                 mesh: Optional[Any] = None) -> None:
        #: per-epoch hooks ``cb(trainer, epoch, val_result)`` — e.g. the
        #: reference's per-epoch LIME snapshots during combined training
        #: (XAI_Multimodality.py:1657-1679)
        self.epoch_callbacks = epoch_callbacks or []
        self.state = state
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            # data-parallel training over a device mesh — the DDP loop the
            # reference runs via torch.distributed/NCCL
            # (training_distributed.py:22-141), here a shard_map step with
            # the gradient psum inside the compiled program.  Train batches
            # are sharded over the `data` axis (the leading batch dim must
            # divide it); eval runs the ordinary jitted step — its batch is
            # uncommitted, so XLA replicates it onto the mesh the params
            # live on (ragged val tails need no padding).
            from ..parallel import make_parallel_train_step, shard_batch
            self.train_step = make_parallel_train_step(
                mesh, state, l2_lambda=cfg.l2_lambda)
            self._shard = lambda b: shard_batch(mesh, b)
        else:
            self.train_step = make_train_step(l2_lambda=cfg.l2_lambda)
            self._shard = None
        self.eval_step = make_eval_step()
        self.evaluator = Evaluator(list(cfg.eval_metrics))
        self.ckpt = (CheckpointManager(ckpt_dir, cfg.ckpt_metric,
                                       cfg.ckpt_mode)
                     if ckpt_dir else None)
        if self.ckpt is not None:
            self.ckpt = self.ckpt.divert_on_change(
                {"l2_lambda": cfg.l2_lambda, **(cfg.hyperparams or {})})
        self.loggers = loggers or []
        self.history: Dict[str, List[float]] = {"train_loss": [],
                                                "val_loss": []}
        self.rng = jax.random.PRNGKey(cfg.seed)

    # ------------------------------------------------------------------

    def _maybe_set_lr(self, counter: int) -> None:
        if self.cfg.lr_schedule is not None:
            self.state = set_learning_rate(
                self.state, float(self.cfg.lr_schedule(counter)))

    def train_epoch(self, train_iter: Iterable[Dict[str, np.ndarray]],
                    epoch: int) -> float:
        losses = []
        skips = []        # device flags; summed once at epoch end (no
        for i, batch in enumerate(train_iter):      # per-step host sync)
            if self.cfg.step_per_batch:
                self._maybe_set_lr(int(self.state.step))
            if self._shard is not None:
                batch = self._shard(batch)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            self.state, metrics = self.train_step(self.state, batch, self.rng)
            losses.append(metrics["loss"])
            if "nonfinite" in metrics:
                skips.append(metrics["nonfinite"])
            if i % self.cfg.log_every == 0:
                for lg in self.loggers:
                    lg.log_loss(float(metrics["loss"]), int(self.state.step))
        if not losses:
            raise ValueError(
                "training iterator yielded no batches — the batch size "
                "(rounded up for --mesh when set) likely exceeds the "
                "training-split size, and drop_last discards the short "
                "tail batch")
        stack = jnp.stack(losses)
        skipped = jnp.stack(skips) if skips else None
        n_skip = int(skipped.sum()) if skipped is not None else 0
        if n_skip:
            # report the mean over the APPLIED steps only — masked by the
            # sentinel flags themselves (a skipped step can have a finite
            # loss when only a gradient overflowed) — and surface the
            # event (SURVEY §5.3)
            logger.warning("epoch %d: %d/%d batches skipped by the "
                           "non-finite sentinel", epoch, n_skip, len(losses))
            good = ~skipped
            return float(jnp.where(good, stack, 0.0).sum()
                         / jnp.maximum(good.sum(), 1))
        return float(jnp.mean(stack))

    def eval_epoch(self, val_iter: Iterable[Dict[str, np.ndarray]]):
        all_logits, all_targets, losses = [], [], []
        for batch in val_iter:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            logits, loss = self.eval_step(self.state, batch)
            all_logits.append(np.asarray(logits))
            all_targets.append(np.asarray(batch["y"]))
            losses.append(float(loss))
        y_pred = jnp.asarray(np.concatenate(all_logits))
        y_true = jnp.asarray(np.concatenate(all_targets))
        result = self.evaluator.evaluate(y_true, y_pred)
        return float(np.mean(losses)), result, np.asarray(y_pred)

    # ------------------------------------------------------------------

    @staticmethod
    def _epoch_iter(loader: Callable, epoch: int) -> Iterable:
        """Call a loader factory, passing the epoch number when it accepts
        one.  Epoch-aware factories key their shuffle/augmentation seeds on
        the ACTUAL epoch, so a resumed run replays the same data stream an
        uninterrupted run would see at that epoch (a zero-arg factory with
        an internal call counter would silently restart its seed stream
        from zero on resume)."""
        try:
            import inspect
            takes_epoch = bool(inspect.signature(loader).parameters)
        except (TypeError, ValueError):
            takes_epoch = False
        return loader(epoch) if takes_epoch else loader()

    def train_eval(self, train_loader: Callable[[], Iterable],
                   val_loader: Callable[[], Iterable],
                   fold: Optional[int] = None):
        """Full loop (training_utils.py:414-454).  Loader args are
        callables returning fresh epoch iterators — zero-arg, or taking
        the epoch number (see ``_epoch_iter``).

        With ``cfg.resume`` the loop restarts from the latest per-epoch
        snapshot under ``ckpt_dir`` — train state, epoch counter, loss
        history and best-metric bookkeeping all restored, exactly the
        reference's ``load_checkpoint`` semantics (data_utils.py:256-311).
        """
        best_metric = float("inf")
        bad_epochs = 0
        oof = None
        start_epoch = 0
        if self.cfg.resume and self.ckpt is not None:
            latest = self.ckpt.latest_step()
            if latest is not None:
                self.state = self.ckpt.restore(f"step_{latest}", self.state)
                meta = self.ckpt.load_meta(f"step_{latest}") or {}
                start_epoch = int(meta.get("epoch", latest - 1)) + 1
                hist = meta.get("history")
                if hist:
                    self.history = {k: list(v) for k, v in hist.items()}
                best_metric = float(meta.get("best_metric", best_metric))
                self.ckpt.best_score = float(meta.get("best_score",
                                                      self.ckpt.best_score))
                self.ckpt.best_epoch = int(meta.get("best_epoch",
                                                    self.ckpt.best_epoch))
                bad_epochs = int(meta.get("bad_epochs", 0))
                pl = meta.get("plateau")
                if pl is not None and self.cfg.plateau is not None:
                    # the plateau controller is host-side mutable state;
                    # without this the first post-resume epoch would reset
                    # the LR to its initial value
                    self.cfg.plateau.lr = float(pl[0])
                    self.cfg.plateau.best = float(pl[1])
                    self.cfg.plateau.num_bad = int(pl[2])
                logger.info("resumed from epoch snapshot step_%d "
                            "(next epoch %d)", latest, start_epoch)
        for epoch in range(start_epoch, self.cfg.epochs):
            t0 = time.time()
            if not self.cfg.step_per_batch:
                self._maybe_set_lr(epoch)
            train_loss = self.train_epoch(
                self._epoch_iter(train_loader, epoch), epoch)
            val_loss, val_result, preds = self.eval_epoch(val_loader())
            if self.cfg.plateau is not None:
                self.state = set_learning_rate(
                    self.state, self.cfg.plateau.step(val_loss))
            self.history["train_loss"].append(train_loss)
            self.history["val_loss"].append(val_loss)
            last = epoch == self.cfg.epochs - 1
            if self.ckpt is not None:
                improved = self.ckpt.step(epoch, self.state, val_result, last)
            else:
                improved = val_result[self.cfg.ckpt_metric] < best_metric
            score = val_result[self.cfg.ckpt_metric]
            if score < best_metric:
                best_metric = score
                bad_epochs = 0
                oof = preds
            else:
                bad_epochs += 1
            if self.ckpt is not None:
                # per-epoch resume point (the reference saves an epoch
                # tarball every epoch, data_utils.py:256-311); pruned to
                # the last `keep` snapshots
                pl = self.cfg.plateau
                self.ckpt.save_step(
                    epoch + 1, self.state,
                    meta={"epoch": epoch, "history": self.history,
                          "best_metric": best_metric,
                          "best_score": self.ckpt.best_score,
                          "best_epoch": self.ckpt.best_epoch,
                          "bad_epochs": bad_epochs,
                          "plateau": ([pl.lr, pl.best, pl.num_bad]
                                      if pl is not None else None)})
            msg = (f"[fold {fold}] " if fold is not None else "") + (
                f"epoch {epoch}: train_loss={train_loss:.4f} "
                f"val_loss={val_loss:.4f} "
                + " ".join(f"{k}={v:.4f}" for k, v in val_result.items())
                + f" ({time.time()-t0:.1f}s)")
            logger.info(msg)
            for lg in self.loggers:
                lg.log_evaluation(val_result, epoch)
            for cb in self.epoch_callbacks:
                cb(self, epoch, val_result)
            if self.cfg.es_patience and bad_epochs >= self.cfg.es_patience:
                logger.info(f"early stop at epoch {epoch}")
                break
        # final eval with the best checkpoint (training_utils.py:532-556)
        if self.ckpt is not None and self.ckpt.best_epoch >= 0:
            self.state = self.ckpt.load_best(self.state)
            _, final_result, oof = self.eval_epoch(val_loader())
            logger.info("final (best ckpt): " +
                        " ".join(f"{k}={v:.4f}" for k, v in final_result.items()))
        return self.state, best_metric, oof

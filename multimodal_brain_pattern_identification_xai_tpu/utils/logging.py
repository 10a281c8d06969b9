"""Logging — one builder replacing the reference's two (``_Logger``
cfg_utils.py:264-331 and ``setup_logger`` logger_utils.py:11-59) plus an
optional wandb adapter (``WandbLogger`` cfg_utils.py:182-256) that degrades
to a local JSONL metrics file when wandb is unavailable (this image has no
wandb and no egress)."""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from datetime import datetime
from typing import Any, Dict, Optional

_FORMAT = "%(asctime)s | %(levelname)s | %(name)s | %(message)s"


def get_logger(name: str = "mbx", level: str = "info") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    return logger


def setup_file_logger(log_dir: str, name: str = "mbx",
                      resume_file: Optional[str] = None) -> logging.Logger:
    """Timestamped ``log_YYYYmmdd_HHMMSS.txt`` file handler, reusing an
    existing file when resuming (logger_utils.py:11-59)."""
    os.makedirs(log_dir, exist_ok=True)
    fname = resume_file or f"log_{datetime.now():%Y%m%d_%H%M%S}.txt"
    logger = get_logger(name)
    path = os.path.join(log_dir, fname)
    fh = logging.FileHandler(path)
    fh.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(fh)
    logger.info("logging to %s", path)
    return logger


class WandbLogger:
    """wandb-compatible experiment logger with a JSONL fallback.

    API mirror of the reference (cfg_utils.py:182-256): ``log_loss`` per
    step, ``log_evaluation`` per eval, ``save_model`` artifact note.
    """

    def __init__(self, project: str, exp_id: str,
                 log_dir: str = "logs", config: Optional[Dict] = None):
        self.exp_id = exp_id
        self._wandb = None
        self._wandb_mod = None
        try:
            import wandb  # noqa: F401
            self._wandb = wandb.init(project=project, name=exp_id,
                                     config=config or {})
            self._wandb_mod = wandb
        except Exception:
            os.makedirs(log_dir, exist_ok=True)
            self._path = os.path.join(log_dir, f"metrics_{exp_id}.jsonl")
            self._fh = open(self._path, "a")

    def _emit(self, record: Dict[str, Any]) -> None:
        if self._wandb is not None:
            self._wandb.log(record)
        else:
            record["ts"] = time.time()
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()

    def log_loss(self, loss: float, step: int) -> None:
        self._emit({"train/loss": float(loss), "step": int(step)})

    def log_evaluation(self, metrics: Dict[str, float], epoch: int) -> None:
        self._emit({f"val/{k}": float(v) for k, v in metrics.items()}
                   | {"epoch": int(epoch)})

    def plot_loss(self, losses, label: str = "loss") -> None:
        """Line-series upload (reference ``plot_loss``, cfg_utils.py:219-
        231: a wandb line plot over all steps so far).  JSONL fallback
        records the full series in one row."""
        series = [float(v) for v in losses]
        if self._wandb is not None:
            # Table/plot live on the wandb MODULE, not the Run object
            table = self._wandb_mod.Table(
                data=[[i, v] for i, v in enumerate(series)],
                columns=["step", label])
            self._emit({f"plots/{label}": self._wandb_mod.plot.line(
                table, "step", label, title=label)})
        else:
            self._emit({f"plots/{label}": series})

    def plot_metrics(self, metrics: Dict[str, Any]) -> None:
        """Multi-series counterpart of the reference ``plot_metrics``
        (cfg_utils.py:233-245): one named series per metric."""
        for name, series in metrics.items():
            self.plot_loss(series, label=name)

    def save_model(self, path: str) -> None:
        self._emit({"checkpoint": path})

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        else:
            self._fh.close()

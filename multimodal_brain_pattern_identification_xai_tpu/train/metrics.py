"""Evaluation metrics (reference ``Evaluator`` training_utils.py:178-241;
``calculate_metrics`` / ``create_confusion_matrix`` data_utils.py:403-435,
536-599; hard/soft accuracy of training.py:58-76) as jnp programs."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from .losses import cross_entropy_with_logits, kldiv_with_logits


class Evaluator:
    """Metric registry + runner (training_utils.py:178-241).

    ``evaluate(y_true, y_pred)`` takes prediction *logits* and soft targets
    and returns a dict of floats.
    """

    def __init__(self, metric_names: List[str]) -> None:
        self.metric_names = list(metric_names)
        self.eval_metrics: Dict[str, Callable] = {}
        for name in self.metric_names:
            if name == "kldiv":
                self.eval_metrics[name] = lambda yp, yt: kldiv_with_logits(yp, yt)
            elif name == "ce":
                self.eval_metrics[name] = lambda yp, yt: cross_entropy_with_logits(yp, yt)
            elif name == "accuracy":
                self.eval_metrics[name] = lambda yp, yt: hard_accuracy(yp, yt)
            elif name == "f1":
                self.eval_metrics[name] = (
                    lambda yp, yt: macro_precision_recall_f1(
                        jnp.argmax(yp, -1), jnp.argmax(yt, -1),
                        yp.shape[-1])[2])
            else:
                raise ValueError(f"unknown metric {name!r}")

    def evaluate(self, y_true: jnp.ndarray, y_pred: jnp.ndarray
                 ) -> Dict[str, float]:
        return {name: float(fn(y_pred, y_true))
                for name, fn in self.eval_metrics.items()}


def hard_accuracy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """argmax-vs-argmax accuracy (training.py:62-64)."""
    return jnp.mean(jnp.argmax(logits, -1) == jnp.argmax(targets, -1))


def soft_accuracy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Probability mass the target distribution puts on the predicted class
    (training.py:66-70 'soft accuracy')."""
    pred = jnp.argmax(logits, -1)
    return jnp.mean(jnp.take_along_axis(targets, pred[:, None], axis=1))


def confusion_matrix(y_pred: jnp.ndarray, y_true: jnp.ndarray,
                     n_classes: int) -> jnp.ndarray:
    """(n_classes, n_classes) count matrix, rows = true class."""
    idx = y_true * n_classes + y_pred
    flat = jnp.bincount(idx.astype(jnp.int32), length=n_classes * n_classes)
    return flat.reshape(n_classes, n_classes)


def macro_precision_recall_f1(y_pred: jnp.ndarray, y_true: jnp.ndarray,
                              n_classes: int, eps: float = 1e-12):
    """Macro-averaged PRF over argmax predictions, matching sklearn's
    ``precision_recall_fscore_support(average='macro', zero_division=0)``
    as used by ``calculate_metrics`` (data_utils.py:403-435)."""
    cm = confusion_matrix(y_pred, y_true, n_classes).astype(jnp.float32)
    tp = jnp.diag(cm)
    pred_tot = cm.sum(0)
    true_tot = cm.sum(1)
    precision = jnp.where(pred_tot > 0, tp / (pred_tot + eps), 0.0)
    recall = jnp.where(true_tot > 0, tp / (true_tot + eps), 0.0)
    f1 = jnp.where(precision + recall > 0,
                   2 * precision * recall / (precision + recall + eps), 0.0)
    return precision.mean(), recall.mean(), f1.mean()

"""LR schedules — all four the reference uses (SURVEY.md §2.E):

* ``warmup_cosine_schedule``   — manual per-epoch math, training_utils.py:151-159
* ``linear_warmup_cosine_annealing`` — data_utils.py:362-368
* ``cosine_schedule_with_warmup``    — HF ``get_cosine_schedule_with_warmup``
  semantics (main_2.py:364), per optimization step
* ``step_decay``               — torch ``StepLR``
* ``ReduceLROnPlateau``        — stateful host-side controller

The pure ones return optax-compatible ``step -> lr`` callables.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def warmup_cosine_schedule(warmup_epochs: int, total_epochs: int,
                           initial_lr: float, peak_lr: float,
                           min_lr: float) -> Callable:
    """Per-epoch: linear initial→peak over warmup, cosine peak→min after
    (training_utils.py:151-159)."""
    def fn(epoch):
        e = jnp.asarray(epoch, jnp.float32)
        warm = initial_lr + (peak_lr - initial_lr) * (e + 1) / max(warmup_epochs, 1)
        progress = (e - warmup_epochs) / max(total_epochs - warmup_epochs, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * progress))
        anneal = min_lr + (peak_lr - min_lr) * cos
        return jnp.where(e < warmup_epochs, warm, anneal)
    return fn


def linear_warmup_cosine_annealing(warmup_steps: int, total_steps: int,
                                   peak_lr: float,
                                   min_lr: float = 0.0) -> Callable:
    """Linear 0→peak warmup then cosine annealing (data_utils.py:362-368)."""
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = peak_lr * (s + 1) / max(warmup_steps, 1)
        progress = (s - warmup_steps) / max(total_steps - warmup_steps, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * jnp.clip(progress, 0, 1)))
        return jnp.where(s < warmup_steps, warm, min_lr + (peak_lr - min_lr) * cos)
    return fn


def cosine_schedule_with_warmup(num_warmup_steps: int,
                                num_training_steps: int, peak_lr: float,
                                num_cycles: float = 0.5) -> Callable:
    """HF ``get_cosine_schedule_with_warmup`` semantics (main_2.py:364)."""
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = s / max(1, num_warmup_steps)
        progress = (s - num_warmup_steps) / max(
            1, num_training_steps - num_warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress)))
        return peak_lr * jnp.where(s < num_warmup_steps, warm, cos)
    return fn


def step_decay(initial_lr: float, step_size: int, gamma: float) -> Callable:
    """torch ``StepLR``: lr·γ^⌊epoch/step_size⌋."""
    def fn(step):
        return initial_lr * gamma ** (jnp.asarray(step) // step_size)
    return fn


class ReduceLROnPlateau:
    """Host-side plateau controller with torch semantics (mode='min',
    used by the notebook loops, XAI_Multimodality.py:1767).  Call
    ``step(metric)`` each epoch; read ``.lr``."""

    def __init__(self, initial_lr: float, factor: float = 0.1,
                 patience: int = 10, min_lr: float = 0.0,
                 threshold: float = 1e-4, mode: str = "min") -> None:
        self.lr = initial_lr
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.mode = mode
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad = 0

    def step(self, metric: float) -> float:
        improved = (metric < self.best * (1 - self.threshold)
                    if self.mode == "min"
                    else metric > self.best * (1 + self.threshold))
        if improved:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr

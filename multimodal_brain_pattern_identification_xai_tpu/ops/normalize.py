"""Normalization / scaling primitives (batched, on-device).

Counterparts of the reference's per-sample numpy helpers:
``normalize`` (z-score, XAI_Multimodality.py:869-872),
``normalize_signal`` (min-max, data_utils.py:133-136),
``baseline_correction`` (data_utils.py:129-131),
clip-and-scale (dataset.py:92-93) and mu-law encoding (dataset.py:138-141).
"""

from __future__ import annotations

import jax.numpy as jnp


def zscore(x: jnp.ndarray, axis: int = -1, eps: float = 1e-6) -> jnp.ndarray:
    """Per-lane z-score, matching ``(x - mean) / (std + eps)``."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    std = jnp.std(x, axis=axis, keepdims=True)
    return (x - mean) / (std + eps)


def minmax(x: jnp.ndarray, axis=None, eps: float = 1e-6) -> jnp.ndarray:
    """Scale to [0, 1]: ``(x - min) / (max - min + eps)``.

    With ``axis=None`` normalizes over the whole (per-sample) array like
    ``normalize_signal`` (data_utils.py:133-136); NaNs must already be fixed.
    """
    mn = jnp.min(x, axis=axis, keepdims=axis is not None)
    mx = jnp.max(x, axis=axis, keepdims=axis is not None)
    return (x - mn) / (mx - mn + eps)


def clip_scale(x: jnp.ndarray, clip: float = 1024.0, scale: float = 32.0) -> jnp.ndarray:
    """``clip(x, ±clip); nan→0; x/scale`` (dataset.py:92-93)."""
    x = jnp.clip(x, -clip, clip)
    x = jnp.nan_to_num(x, nan=0.0)
    return x / scale


def mu_law_encode(x: jnp.ndarray, mu: float = 1.0) -> jnp.ndarray:
    """Mu-law companding (dataset.py:143-146): sign(x)·log1p(mu|x|)/log1p(mu)."""
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)


def baseline_correction(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Column-mean subtraction (data_utils.py:129-131)."""
    return x - jnp.mean(x, axis=axis, keepdims=True)

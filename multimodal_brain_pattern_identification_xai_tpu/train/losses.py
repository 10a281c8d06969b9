"""Losses (reference ``KLDivWithLogitsLoss``, training_utils.py:165-175,
plus the manual L2 term of the notebook loops, XAI_Multimodality.py:1355).

All losses consume **soft vote-probability targets** (B, n_classes) — the
HMS labels are normalized expert-vote distributions (main.py:108-122).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def kldiv_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                      eps: float = 1e-12) -> jnp.ndarray:
    """KL(targets ‖ softmax(logits)) with 'batchmean' reduction — exactly
    torch ``KLDivLoss(reduction='batchmean')(log_softmax(x), t)``."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    t = targets
    # torch KLDiv: t * (log t - logp), with 0 log 0 := 0
    per = jnp.where(t > 0, t * (jnp.log(jnp.clip(t, eps, None)) - logp), 0.0)
    return jnp.sum(per) / logits.shape[0]


def kldiv_with_log_probs(log_probs: jnp.ndarray, targets: jnp.ndarray,
                         eps: float = 1e-12) -> jnp.ndarray:
    """Same, for models that already emit log-probabilities (the reference
    models end in LogSoftmax and are trained with ``nn.KLDivLoss`` directly,
    XAI_Multimodality.py:1331)."""
    t = targets
    per = jnp.where(t > 0,
                    t * (jnp.log(jnp.clip(t, eps, None)) - log_probs), 0.0)
    return jnp.sum(per) / log_probs.shape[0]


def cross_entropy_with_logits(logits: jnp.ndarray,
                              targets: jnp.ndarray) -> jnp.ndarray:
    """Soft-target cross-entropy (torch ``CrossEntropyLoss`` with prob
    targets)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def l2_regularization(params: Any, lam: float) -> jnp.ndarray:
    """Manual L2 penalty ``λ·Σ‖w‖²`` over kernel parameters only (the
    reference sums over all ``model.parameters()``; restricting to kernels
    matches standard practice and the intent of ``weight_decay``)."""
    if lam == 0.0:
        return jnp.asarray(0.0)
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = 0.0
    for path, leaf in leaves:
        name = str(path[-1]).lower()
        if "kernel" in name or "embedding" in name:
            total = total + jnp.sum(leaf.astype(jnp.float32) ** 2)
    return lam * total

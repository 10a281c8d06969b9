"""Attention rollout (BASELINE.json config #4: transformer encoder on long
EEG "with attention-rollout attribution").

Works off the attention weights every attention layer sows
(``nn.MultiHeadDotProductAttention(sow_weights=True)`` and the custom
``Attention`` module): rollout = ∏_layers normalize(0.5·A + 0.5·I),
averaged over heads (Abnar & Zuidema 2020).
"""

from __future__ import annotations

from typing import List

import flax
import jax.numpy as jnp


def collect_attention_weights(intermediates) -> List[jnp.ndarray]:
    """Pull all sown attention-weight tensors, in module order."""
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(intermediates))
    out = []
    for path, value in sorted(flat.items(), key=lambda kv: kv[0]):
        if any("attention_weights" in str(p) for p in path):
            v = value[0] if isinstance(value, tuple) else value
            out.append(jnp.asarray(v))
    return out


def attention_rollout(attn_weights: List[jnp.ndarray],
                      residual_alpha: float = 0.5) -> jnp.ndarray:
    """Compose per-layer attention maps into token-level relevance.

    Args:
        attn_weights: list of (B, [H,] L, L) per layer (head axis optional;
            averaged if present).
    Returns (B, L, L) rollout matrix; row 0 (CLS) is the usual relevance.
    """
    rollout = None
    for a in attn_weights:
        if a.ndim == 4:
            a = a.mean(axis=1)                      # head average
        L = a.shape[-1]
        a = residual_alpha * a + (1 - residual_alpha) * jnp.eye(L)[None]
        a = a / jnp.sum(a, axis=-1, keepdims=True)
        rollout = a if rollout is None else jnp.einsum(
            "bij,bjk->bik", a, rollout)
    return rollout


def rollout_from_model(model, variables, x, **apply_kwargs) -> jnp.ndarray:
    """One forward with intermediates capture → rollout matrix."""
    _, inter = model.apply(variables, x, mutable=["intermediates"],
                           **apply_kwargs)
    weights = collect_attention_weights(inter["intermediates"])
    if not weights:
        raise ValueError("model sowed no attention weights")
    return attention_rollout(weights)

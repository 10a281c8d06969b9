"""Vanilla gradient saliency (reference ``generate_saliency_maps``,
XAI_Multimodality.py:3056-3153: requires_grad inputs → forward → backward
on the max logit → |grad|).

Here: one ``jax.grad``/``vjp`` per *batch* — no per-sample hooks, no
retain_grad, no double backward; the multimodal variant differentiates
w.r.t. both inputs in a single backward pass.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _select(logits: jnp.ndarray, target: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Per-sample scalar: the max logit (reference behavior) or a chosen
    class logit."""
    if target is None:
        return jnp.max(logits, axis=-1)
    return jnp.take_along_axis(logits, target[:, None], axis=-1)[:, 0]


def saliency_maps(forward: Callable[[jnp.ndarray], jnp.ndarray],
                  x: jnp.ndarray,
                  target: Optional[jnp.ndarray] = None,
                  absolute: bool = True) -> jnp.ndarray:
    """|∂ max-logit / ∂x| for a whole batch.

    Args:
        forward: ``x → logits`` closure (params already bound).
        target: optional (B,) class indices; default = per-sample argmax
            stop-gradiented, like the reference's ``output.max(1)``.
    """
    if target is None:
        target = jnp.argmax(jax.lax.stop_gradient(forward(x)), axis=-1)

    def score(xx):
        return jnp.sum(_select(forward(xx), target))

    g = jax.grad(score)(x)
    return jnp.abs(g) if absolute else g


def multimodal_saliency(forward: Callable[[jnp.ndarray, jnp.ndarray],
                                          jnp.ndarray],
                        eeg: jnp.ndarray, spec: jnp.ndarray,
                        target: Optional[jnp.ndarray] = None,
                        absolute: bool = True
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Saliency of both branches in ONE backward pass (the reference runs
    backward twice, once per modality, XAI_Multimodality.py:3077-3100)."""
    if target is None:
        target = jnp.argmax(jax.lax.stop_gradient(forward(eeg, spec)), -1)

    def score(e, s):
        return jnp.sum(_select(forward(e, s), target))

    ge, gs = jax.grad(score, argnums=(0, 1))(eeg, spec)
    if absolute:
        ge, gs = jnp.abs(ge), jnp.abs(gs)
    return ge, gs

"""Integrated Gradients — Captum's ``IntegratedGradients`` is imported by
the reference as intended capability (XAI_Multimodality.py:51, 2224) but
never called; implemented live here.

TPU-native form: the interpolation path is a *batch axis* — one vmapped
forward/backward over all steps at once (BASELINE.json config #5's
"vmapped baseline sweeps"), trivially pod-shardable by splitting the step
axis over the mesh.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def integrated_gradients(forward: Callable[[jnp.ndarray], jnp.ndarray],
                         x: jnp.ndarray,
                         baseline: Optional[jnp.ndarray] = None,
                         target: Optional[jnp.ndarray] = None,
                         steps: int = 50) -> jnp.ndarray:
    """IG(x) = (x − x₀) · ∫₀¹ ∂f(x₀ + α(x − x₀))/∂x dα  (Riemann midpoint).

    Satisfies the completeness axiom Σ attr ≈ f(x) − f(x₀) (tested).

    Args:
        forward: ``(B, ...) → (B, C)`` logits closure.
        baseline: same shape as ``x``; zeros by default.
        target: (B,) class indices; default argmax at ``x``.
    """
    if baseline is None:
        baseline = jnp.zeros_like(x)
    if target is None:
        target = jnp.argmax(forward(x), axis=-1)

    alphas = (jnp.arange(steps, dtype=x.dtype) + 0.5) / steps

    def score(xx):
        logits = forward(xx)
        return jnp.sum(jnp.take_along_axis(logits, target[:, None], -1))

    def grad_at(alpha):
        point = baseline + alpha * (x - baseline)
        return jax.grad(score)(point)

    grads = jax.vmap(grad_at)(alphas)          # (steps, B, ...)
    avg_grad = jnp.mean(grads, axis=0)
    return (x - baseline) * avg_grad

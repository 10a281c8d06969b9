"""Expected gradients — the SHAP ``GradientExplainer`` equivalent
(reference XAI_Multimodality.py:2242-2329: 100-sample background batch →
``shap.GradientExplainer(eeg_model, background).shap_values(sample)`` →
per-class (1, 37, 3000) attributions).

GradientExplainer approximates SHAP values as *expected gradients*::

    φ(x) ≈ E_{b ~ background, α ~ U(0,1)} [ (x − b) · ∂f_c(b + α(x − b))/∂x ]

Here the (background × α) Monte-Carlo sweep is a single vmapped batch on
device — and, like IG, shards over the mesh by splitting the sample axis
(BASELINE.json config #5).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def expected_gradients(forward: Callable[[jnp.ndarray], jnp.ndarray],
                       x: jnp.ndarray,
                       background: jnp.ndarray,
                       key: jax.Array,
                       target: jnp.ndarray,
                       nsamples: int = 200,
                       chunk: Optional[int] = None) -> jnp.ndarray:
    """Expected-gradients attribution for class ``target``.

    Args:
        x: (B, ...) inputs to explain.
        background: (N, ...) background/reference samples.
        target: (B,) class indices.
        nsamples: Monte-Carlo draws per explained sample (shap's
            ``nsamples``, default 200).
        chunk: when set, the Monte-Carlo draws run ``chunk`` at a time
            under a ``lax.scan`` (effective network batch ``chunk × B``
            instead of ``nsamples × B``) so production-size sweeps fit in
            HBM.  Must divide ``nsamples``; same expectation, different
            f32 summation order.
    Returns (B, ...) attributions.
    """
    kb, ka = jax.random.split(key)
    n_bg = background.shape[0]
    B = x.shape[0]
    bg_idx = jax.random.randint(kb, (nsamples, B), 0, n_bg)
    alphas = jax.random.uniform(ka, (nsamples, B))

    def score(xx):
        logits = forward(xx)
        return jnp.sum(jnp.take_along_axis(logits, target[:, None], -1))

    def one_draw(idx, alpha):
        b = background[idx]                              # (B, ...)
        a = alpha.reshape((-1,) + (1,) * (x.ndim - 1))
        point = b + a * (x - b)
        g = jax.grad(score)(point)
        return (x - b) * g

    if chunk is None or chunk >= nsamples:
        draws = jax.vmap(one_draw)(bg_idx, alphas)       # (nsamples, B, ...)
        return jnp.mean(draws, axis=0)
    if nsamples % chunk:
        raise ValueError(f"chunk={chunk} must divide nsamples={nsamples}")

    def body(acc, idx_alpha):
        idx, alpha = idx_alpha
        return acc + jnp.sum(jax.vmap(one_draw)(idx, alpha), axis=0), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros_like(x),
        (bg_idx.reshape(nsamples // chunk, chunk, B),
         alphas.reshape(nsamples // chunk, chunk, B)))
    return acc / nsamples


def gradient_shap_values(forward: Callable[[jnp.ndarray], jnp.ndarray],
                         x: jnp.ndarray,
                         background: jnp.ndarray,
                         key: jax.Array,
                         n_classes: int = 6,
                         nsamples: int = 200,
                         chunk: Optional[int] = None) -> jnp.ndarray:
    """Per-class SHAP values like ``GradientExplainer.shap_values``:
    returns (n_classes, B, ...) — one attribution map per output class
    (the reference iterates its ``shap_values`` list per class for the
    summary/bar plots, XAI_Multimodality.py:2335-2461).  ``chunk`` is
    forwarded to :func:`expected_gradients` (HBM control for large B)."""
    keys = jax.random.split(key, n_classes)

    def per_class(c, k):
        tgt = jnp.full((x.shape[0],), c)
        return expected_gradients(forward, x, background, k, tgt, nsamples,
                                  chunk)

    return jnp.stack([per_class(c, keys[c]) for c in range(n_classes)])

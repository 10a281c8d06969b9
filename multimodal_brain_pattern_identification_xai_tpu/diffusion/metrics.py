"""Generation-quality metrics (reference DiffEEG_utils.py:184-274), as
jittable jnp programs.

``compute_frechet_distance`` replaces ``scipy.linalg.sqrtm`` with an
eigendecomposition-based matrix square root of the symmetrized product —
the standard FID trick ``tr√(Σ₁Σ₂) = tr√(√Σ₁ Σ₂ √Σ₁)`` so all
decompositions are of symmetric PSD matrices (eigh runs on-device; no
host round trip).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _flatten(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1)


def compute_mmd(real: jnp.ndarray, generated: jnp.ndarray,
                kernel_bandwidth: float = 1.0) -> jnp.ndarray:
    """Gaussian-kernel MMD (DiffEEG_utils.py:184-217)."""
    x = _flatten(real)
    y = _flatten(generated)

    def k(a, b):
        an = jnp.sum(a * a, axis=-1, keepdims=True)
        bn = jnp.sum(b * b, axis=-1, keepdims=True)
        d = an + bn.T - 2.0 * (a @ b.T)
        return jnp.exp(-d / (2.0 * kernel_bandwidth ** 2))

    return (jnp.mean(k(x, x)) + jnp.mean(k(y, y)) - 2.0 * jnp.mean(k(x, y)))


def _sqrtm_psd(m: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    w, v = jnp.linalg.eigh(m)
    w = jnp.clip(w, eps, None)
    return (v * jnp.sqrt(w)) @ v.T


def compute_frechet_distance(real: jnp.ndarray, generated: jnp.ndarray,
                             eps: float = 1e-6) -> jnp.ndarray:
    """Fréchet distance between Gaussian fits (DiffEEG_utils.py:224-243).

    For wide features (D ≫ n samples — e.g. flattened (19, 2000) EEG,
    D = 38,000) the covariances are rank ≤ n, and forming the D×D
    matrices (5.8 GB) plus their eigh (O(D³)) is intractable.  The
    sample-space identity makes it exact and cheap instead: with centered
    A (n, D), B (m, D) scaled by 1/√(n−1), the nonzero eigenvalues of
    ``cx·cy = AᵀA·BᵀB`` equal those of ``(ABᵀ)(ABᵀ)ᵀ`` (n×m), so
    ``tr√(cx·cy)`` is the nuclear norm of ``ABᵀ`` (without the eps ridge,
    which only exists for numerical stability of the dense path)."""
    x = _flatten(real)
    y = _flatten(generated)
    n, d = x.shape
    m = y.shape[0]
    mu_x, mu_y = x.mean(0), y.mean(0)
    mean_diff = jnp.sum((mu_x - mu_y) ** 2)
    if d > 512 and d > 4 * (n + m):
        a = (x - mu_x) / np.sqrt(max(n - 1, 1))
        b = (y - mu_y) / np.sqrt(max(m - 1, 1))
        tr_x = jnp.sum(a * a)
        tr_y = jnp.sum(b * b)
        cross = a @ b.T                              # (n, m)
        nuc = jnp.sum(jnp.linalg.svd(cross, compute_uv=False))
        return mean_diff + tr_x + tr_y - 2.0 * nuc
    cx = jnp.cov(x, rowvar=False) + eps * jnp.eye(d)
    cy = jnp.cov(y, rowvar=False) + eps * jnp.eye(d)
    sx = _sqrtm_psd(cx)
    cov_sqrt = _sqrtm_psd(sx @ cy @ sx)
    return mean_diff + jnp.trace(cx + cy) - 2.0 * jnp.trace(cov_sqrt)


def pearson_correlation(real: jnp.ndarray, generated: jnp.ndarray,
                        eps: float = 1e-8) -> jnp.ndarray:
    """Mean per-sample Pearson correlation (DiffEEG_utils.py:250-274)."""
    x = _flatten(real)
    y = _flatten(generated)
    xc = x - x.mean(1, keepdims=True)
    yc = y - y.mean(1, keepdims=True)
    num = jnp.sum(xc * yc, axis=1)
    den = jnp.sqrt(jnp.sum(xc * xc, axis=1) * jnp.sum(yc * yc, axis=1))
    return jnp.mean(num / (den + eps))

"""Separable Gaussian smoothing — batched equivalent of
``scipy.ndimage.gaussian_filter(sig, sigma=1.0)`` as used by
``smooth_spectrogram`` (data_utils.py:143-145).

scipy semantics reproduced: truncation at ``4σ`` (radius = int(4σ + 0.5)),
normalized Gaussian taps, 'reflect' boundary (= jnp.pad 'symmetric').
Implemented as two 1-D convolutions over the trailing axes, vmapped over
leading batch axes by construction.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return phi / phi.sum()


def _conv1d_reflect(x: jnp.ndarray, kernel: np.ndarray, axis: int) -> jnp.ndarray:
    k = len(kernel)
    r = k // 2
    x = jnp.moveaxis(x, axis, -1)
    pads = [(0, 0)] * (x.ndim - 1) + [(r, r)]
    xp = jnp.pad(x, pads, mode="symmetric")
    w = jnp.asarray(kernel, x.dtype)
    # Static unrolled tap sum: k is tiny (9 for σ=1); XLA fuses this into a
    # single vectorized expression, no conv dilation bookkeeping needed.
    y = sum(w[i] * xp[..., i:i + x.shape[-1]] for i in range(k))
    return jnp.moveaxis(y, -1, axis)


def gaussian_smooth2d(x: jnp.ndarray, sigma: float = 1.0,
                      truncate: float = 4.0) -> jnp.ndarray:
    """Gaussian blur over the last two axes. ``x``: (..., H, W)."""
    kernel = _gaussian_kernel1d(float(sigma), truncate)
    y = _conv1d_reflect(x, kernel, axis=-2)
    return _conv1d_reflect(y, kernel, axis=-1)

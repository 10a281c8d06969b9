"""Decimation / padding primitives.

Counterparts of the reference's strided downsampling (dataset.py:101-102 and
``denoise_filter``'s 4-tap rolling mean + ``[:, 0:-1:4]`` decimation,
XAI_Multimodality.py:862-867) and ``pad_or_truncate``
(data_utils.py:163-181).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def decimate(x: jnp.ndarray, stride: int, axis: int = -1,
             drop_last: bool = False) -> jnp.ndarray:
    """Strided decimation. ``drop_last=True`` reproduces the reference's
    ``y[:, 0:-1:4]`` slice (drops the final sample before striding)."""
    x = jnp.moveaxis(x, axis, -1)
    if drop_last:
        x = x[..., :-1]
    x = x[..., ::stride]
    return jnp.moveaxis(x, -1, axis)


def rolling_mean4_flat(x: jnp.ndarray) -> jnp.ndarray:
    """``(y + roll(y,-1) + roll(y,-2) + roll(y,-3)) / 4`` with *flattened*
    roll semantics.

    The reference calls ``np.roll(y, -k)`` without an axis
    (XAI_Multimodality.py:865), which rolls the flattened (C, T) array — the
    tail of each channel wraps into the head of the next.  Reproduced bit-
    for-bit here (per trailing 2-D plane) since output parity is a goal.
    """
    lead = x.shape[:-2]
    plane = x.shape[-2] * x.shape[-1]
    xf = x.reshape(lead + (plane,))
    y = (xf + jnp.roll(xf, -1, axis=-1) + jnp.roll(xf, -2, axis=-1)
         + jnp.roll(xf, -3, axis=-1)) / 4.0
    return y.reshape(x.shape)


def rolling_mean4_decimate_flat(x: jnp.ndarray, stride: int = 4) -> jnp.ndarray:
    """Fused ``rolling_mean4_flat`` + ``decimate(stride, drop_last=True)``
    as ONE strided window-sum — exact when T divides by ``stride``.

    The reference chain computes the flat 4-tap mean over the whole (C, T)
    plane and then slices ``[:, 0:-1:4]`` per channel
    (XAI_Multimodality.py:865-866).  With T % 4 == 0 the kept positions are
    exactly the flat indices ≡ 0 (mod 4), so a single stride-4 window-4
    average over the flattened plane (with the 3-sample wrap appended)
    reproduces it while writing T/4 instead of T samples and skipping the
    three shifted full-size copies ``jnp.roll`` needs.
    """
    C, T = x.shape[-2], x.shape[-1]
    if T % stride != 0:
        y = rolling_mean4_flat(x)
        return decimate(y, stride, axis=-1, drop_last=True)
    lead = x.shape[:-2]
    plane = C * T
    xf = x.reshape(lead + (plane,))
    xf = jnp.concatenate([xf, xf[..., :3]], axis=-1)      # flat wrap
    win = jnp.asarray([0.25, 0.25, 0.25, 0.25], x.dtype)
    b = int(np.prod(lead)) if lead else 1
    y = jax.lax.conv_general_dilated(
        xf.reshape(b, -1, 1), win.reshape(4, 1, 1),
        window_strides=(stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))
    y = y.reshape(lead + (C, T // stride))
    # reference keeps 2500 of 2500 per channel minus the excluded final
    # element ([:, 0:-1:4] never reaches index T-1 since T % 4 == 0) —
    # identical index set, nothing further to trim.
    return y


def _mirror_index(i: np.ndarray, n: int) -> np.ndarray:
    """ndimage 'mirror' boundary (skimage mode='reflect'): reflect about the
    edge pixel centers without repeating them — period 2n-2."""
    if n == 1:
        return np.zeros_like(i)
    period = 2 * n - 2
    i = np.abs(i) % period
    return np.where(i >= n, period - i, i)


def _resize_matrix_1d(n_in: int, n_out: int) -> np.ndarray:
    """The (n_out, n_in) linear operator of skimage
    ``resize(..., order=1, mode='reflect', anti_aliasing=True)`` along one
    axis (data_utils.py:147-148): a scipy-exact Gaussian anti-alias
    prefilter (sigma = max(0, (n_in/n_out - 1)/2), truncate 4.0, mirror
    boundary) composed with linear interpolation at half-pixel centers.

    Both stages are convex combinations, so skimage's default output
    clipping to the input range is a provable no-op and is elided.
    Precomputed host-side: on device the 2-D resize is then just two
    matmuls (MXU work, no gathers)."""
    factor = n_in / n_out
    # -- linear interpolation at half-pixel centers (align_corners=False) --
    coords = (np.arange(n_out) + 0.5) * factor - 0.5
    i0 = np.floor(coords).astype(np.int64)
    w = coords - i0
    A = np.zeros((n_out, n_in), np.float64)
    rows = np.arange(n_out)
    np.add.at(A, (rows, _mirror_index(i0, n_in)), 1.0 - w)
    np.add.at(A, (rows, _mirror_index(i0 + 1, n_in)), w)
    # -- Gaussian prefilter (downscale only), scipy gaussian_filter1d exact --
    sigma = max(0.0, (factor - 1.0) / 2.0)
    if sigma > 0:
        r = int(4.0 * sigma + 0.5)
        t = np.arange(-r, r + 1, dtype=np.float64)
        k = np.exp(-0.5 * (t / sigma) ** 2)
        k /= k.sum()
        G = np.zeros((n_in, n_in), np.float64)
        rows_in = np.arange(n_in)
        for off, kv in zip(range(-r, r + 1), k):
            np.add.at(G, (rows_in, _mirror_index(rows_in + off, n_in)), kv)
        A = A @ G
    return A


def resize_antialiased(x: jnp.ndarray,
                       target: Tuple[int, int]) -> jnp.ndarray:
    """Anti-aliased bilinear resize of the last two axes — the TPU-native
    ``resample_spectrogram`` (data_utils.py:147-148: skimage
    ``resize(sig, target, mode='reflect', anti_aliasing=True)``).

    Instead of a gather-based warp, the separable prefilter+interpolation
    operator per axis is materialized host-side (static shapes under jit)
    and applied as two dense matmuls — MXU-friendly, and exactly the
    reference semantics (pinned vs a float64 direct reimplementation in
    tests).  Same-shape calls return ``x`` unchanged, which is the only
    case the reference's live chains ever hit (they pad/crop to
    ``image_size`` first, XAI_Multimodality.py:1182-1189).
    """
    rows, cols = int(target[0]), int(target[1])
    R, Ccur = x.shape[-2], x.shape[-1]
    if (R, Ccur) == (rows, cols):
        return x
    Mh = jnp.asarray(_resize_matrix_1d(R, rows), x.dtype)
    Mw = jnp.asarray(_resize_matrix_1d(Ccur, cols), x.dtype)
    return jnp.einsum("oi,...ij,pj->...op", Mh, x, Mw,
                      precision=jax.lax.Precision.HIGHEST)


def pad_or_truncate(x: jnp.ndarray,
                    target: Union[int, Tuple[int, int]]) -> jnp.ndarray:
    """Zero-pad or truncate to a fixed length / 2-D shape
    (data_utils.py:163-181).  ``int`` target acts on the last axis; tuple
    target acts on the last two axes."""
    if isinstance(target, int):
        T = x.shape[-1]
        if T < target:
            pads = [(0, 0)] * (x.ndim - 1) + [(0, target - T)]
            return jnp.pad(x, pads)
        return x[..., :target]
    rows, cols = target
    R, Ccur = x.shape[-2], x.shape[-1]
    if R < rows:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, rows - R), (0, 0)])
    else:
        x = x[..., :rows, :]
    if Ccur < cols:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 0), (0, cols - Ccur)])
    else:
        x = x[..., :, :cols]
    return x

"""Decimation / padding primitives.

Counterparts of the reference's strided downsampling (dataset.py:101-102 and
``denoise_filter``'s 4-tap rolling mean + ``[:, 0:-1:4]`` decimation,
XAI_Multimodality.py:862-867) and ``pad_or_truncate``
(data_utils.py:163-181).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp


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

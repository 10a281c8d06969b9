"""NaN repair as masked means — static-shape equivalent of ``handle_nan``.

The reference (XAI_Multimodality.py:812-830; data_utils.py:151-161) drops
rows that are entirely NaN and mean-fills partial NaNs.  Dropping rows is a
dynamic-shape operation XLA cannot compile; since an all-NaN row's mean is
defined as 0 there anyway, the static-shape formulation below fills all-NaN
rows with zeros *in place* — identical values for every surviving channel
and identical downstream behavior for complete recordings (channel indices
never shift for the montage, which is also what the reference implicitly
relies on).
"""

from __future__ import annotations

import jax.numpy as jnp


def nan_to_channel_mean(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Replace NaNs with the per-channel ``nanmean`` along ``axis``;
    channels with no valid values become all-zero (nan-mean → 0 like the
    reference's ``mean_values[np.isnan(mean_values)] = 0``)."""
    valid = ~jnp.isnan(x)
    cnt = jnp.sum(valid, axis=axis, keepdims=True)
    total = jnp.sum(jnp.where(valid, x, 0.0), axis=axis, keepdims=True)
    mean = jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)
    return jnp.where(valid, x, mean)

"""Bipolar-montage differencing as one gather-free matmul.

The reference computes each bipolar pair in a Python loop
(``calculate_differential_signals``, XAI_Multimodality.py:852-860;
``_apply_chris_magic_ch8``, dataset.py:105-121).  On TPU the whole montage
is one (C_out × C_in) signed selection matrix applied with a single MXU
matmul over the channel axis, batched over (B, T).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C


def montage_matrix(pairs: Sequence[Tuple[str, str]],
                   columns: Sequence[str] = C.EEG_COLUMNS,
                   keep_originals: bool = True,
                   keep_channels: Optional[Sequence[str]] = None) -> np.ndarray:
    """Build the (C_out, C_in) montage matrix.

    Rows are (optionally) the kept original channels followed by one row per
    bipolar pair with +1 at ``feat_a`` and −1 at ``feat_b``.
    """
    f2i: Dict[str, int] = {name: i for i, name in enumerate(columns)}
    rows = []
    if keep_originals:
        kept = keep_channels if keep_channels is not None else columns
        for ch in kept:
            row = np.zeros(len(columns), np.float32)
            row[f2i[ch]] = 1.0
            rows.append(row)
    for a, b in pairs:
        row = np.zeros(len(columns), np.float32)
        row[f2i[a]] += 1.0
        row[f2i[b]] -= 1.0
        rows.append(row)
    return np.stack(rows)


def apply_montage(x: jnp.ndarray, matrix: np.ndarray) -> jnp.ndarray:
    """Apply a montage matrix. ``x``: (..., C_in, T) → (..., C_out, T)."""
    m = jnp.asarray(matrix, x.dtype)
    # HIGHEST precision: on TPU the default matmul precision is bf16, which
    # would round the raw signals before differencing and break fp32 parity.
    return jnp.einsum("oc,...ct->...ot", m, x,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=x.dtype)


def bipolar_differential(x: jnp.ndarray,
                         columns: Sequence[str] = C.EEG_COLUMNS,
                         pairs: Sequence[Tuple[str, str]] = C.MAP_FEATURES,
                         ) -> jnp.ndarray:
    """Append the 18 double-banana differentials to the raw rows — the
    batched equivalent of ``calculate_differential_signals`` followed by
    ``vstack`` (XAI_Multimodality.py:852-860).

    ``x``: (..., C_in, T) → (..., C_in + len(pairs), T).
    """
    return apply_montage(x, montage_matrix(pairs, columns, keep_originals=True))


def select_and_map_channels(x: jnp.ndarray,
                            columns: Sequence[str] = C.EEG_COLUMNS,
                            features: Sequence[str] = C.EEG_FEATURES,
                            n_pairs: int = len(C.MAP_FEATURES)) -> jnp.ndarray:
    """Keep the 19 scalp channels + the trailing differential rows
    (XAI_Multimodality.py:874-879): (..., C_in+n_pairs, T) → (..., 37, T)."""
    f2i = {name: i for i, name in enumerate(columns)}
    idx = [f2i[ch] for ch in features] + list(
        range(len(columns), len(columns) + n_pairs))
    return x[..., np.asarray(idx), :]


def chris_magic_ch8(x: jnp.ndarray,
                    columns: Sequence[str] = C.EEG_FEATURES) -> jnp.ndarray:
    """Chris' magic-8 bipolar features (dataset.py:105-121).

    ``x``: (..., T, C_in) layout (the raw-EEG transformer works in (L, C));
    returns (..., T, 8).
    """
    m = montage_matrix(C.CHRIS_MAGIC_PAIRS, columns, keep_originals=False)
    return jnp.einsum("oc,...tc->...to", jnp.asarray(m, x.dtype), x,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=x.dtype)

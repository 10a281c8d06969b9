"""SHAP-driven channel selection (reference XAI_Multimodality.py:2335-2587:
mean |SHAP| per channel → ``get_top_n_features`` → ``RestructuredDataset``
slicing the EEG to the top-N channels and binarizing labels for retraining).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from .. import config as C


def mean_abs_attribution_per_channel(shap_values: np.ndarray) -> np.ndarray:
    """(..., C_channels, T) attributions → (C_channels,) mean |attr| over
    every other axis (XAI_Multimodality.py:2335-2370)."""
    a = np.abs(np.asarray(shap_values))
    ch_axis = a.ndim - 2
    other = tuple(i for i in range(a.ndim) if i != ch_axis)
    return a.mean(axis=other)


def get_top_n_channels(shap_values: np.ndarray, n: int = 10
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Top-N channel indices + scores (``get_top_n_features``)."""
    scores = mean_abs_attribution_per_channel(shap_values)
    idx = np.argsort(-scores)[:n]
    return idx, scores[idx]


def channel_names_37() -> list:
    """The 37 model-channel names: 19 scalp + 18 bipolar pair labels
    (matches the notebook's channel axis for summary plots)."""
    return list(C.EEG_FEATURES) + [f"{a}-{b}" for a, b in C.MAP_FEATURES]


def restructure_to_top_channels(x: np.ndarray, y: np.ndarray,
                                top_idx: Sequence[int],
                                positive_class: Optional[int] = None
                                ) -> Tuple[np.ndarray, np.ndarray]:
    """``RestructuredDataset`` equivalent (XAI_Multimodality.py:2467-2533):
    slice the (B, 1, 37, T) EEG to the top-N channels; optionally binarize
    soft labels against one class (one-vs-rest retraining loop).
    """
    x = np.asarray(x)
    sel = x[..., np.asarray(top_idx, np.int64), :]
    if positive_class is None:
        return sel, np.asarray(y)
    hard = np.asarray(y).argmax(-1) if np.asarray(y).ndim > 1 else np.asarray(y)
    binary = (hard == positive_class).astype(np.float32)
    y2 = np.stack([1.0 - binary, binary], axis=-1)
    return sel, y2

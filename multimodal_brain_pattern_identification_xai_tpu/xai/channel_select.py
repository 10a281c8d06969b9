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


def retrain_on_top_channels(x: np.ndarray, y: np.ndarray,
                            shap_values: np.ndarray,
                            n_channels: int = 5,
                            positive_class: int = 0,
                            epochs: int = 3, batch_size: int = 8,
                            lr: float = 1e-3, seed: int = 0,
                            model_kwargs: Optional[dict] = None,
                            ckpt_dir: Optional[str] = None) -> dict:
    """The full ``RestructuredDataset`` → ``EEGOnlyDataset`` retraining
    workflow (XAI_Multimodality.py:2467-2587): rank channels by mean
    |SHAP| of the chosen class, re-slice the EEG to the top-N, binarize
    labels against that class, and train a fresh binary EEGNet on the
    restructured set.

    Args:
        x: (B, 1, C, T) preprocessed EEG.
        y: (B, n_classes) soft/one-hot labels.
        shap_values: (n_classes, B', 1, C, T) per-class attributions
            (``gradient_shap_values`` output) — or any (..., C, T) array
            already sliced to one class.

    Returns a report dict with the top channel indices and the fresh-init
    vs retrained validation metrics (kldiv + accuracy).
    """
    import jax
    import jax.numpy as jnp

    from .. import models
    from .. import train as T
    from ..data import batch_iterator

    sv = np.asarray(shap_values)
    if sv.ndim == np.asarray(x).ndim + 1:       # leading class axis
        sv = sv[positive_class]                  # reference :2520
    top_idx, _ = get_top_n_channels(sv, n=n_channels)
    xs, ys = restructure_to_top_channels(x, y, top_idx, positive_class)
    xs = np.asarray(xs, np.float32)

    n = len(xs)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_val = max(1, n // 4)
    va, tr = perm[:n_val], perm[n_val:]

    kw = dict(nb_classes=2, chans=len(top_idx), samples=xs.shape[-1])
    kw.update(model_kwargs or {})
    model = models.EEGNetAttentionRegularized(**kw)
    state = T.create_train_state(model, (jnp.asarray(xs[:2]),),
                                 T.state.make_optimizer(lr),
                                 jax.random.PRNGKey(seed))
    tc = T.TrainerConfig(epochs=epochs, seed=seed,
                         eval_metrics=("kldiv", "accuracy"))
    # checkpoint so train_eval restores the BEST epoch for the final
    # "retrained" report (last-epoch state can be worse after a plateau);
    # a throwaway directory when the caller does not keep checkpoints
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        trainer = T.Trainer(state, tc, ckpt_dir=ckpt_dir or tmp)

        def tl(epoch=0):
            return batch_iterator({"x": xs[tr], "y": ys[tr]}, batch_size,
                                  shuffle=True, seed=seed + epoch,
                                  drop_last=False)

        def vl():
            return batch_iterator({"x": xs[va], "y": ys[va]}, batch_size,
                                  drop_last=False)

        _, fresh, _ = trainer.eval_epoch(vl())
        _, best, _ = trainer.train_eval(tl, vl)
        # trainer.state now holds the best checkpoint's params
        _, retrained, _ = trainer.eval_epoch(vl())
    return {"top_channels": np.asarray(top_idx).tolist(),
            "positive_class": positive_class,
            "fresh": {k: float(v) for k, v in fresh.items()},
            "retrained": {k: float(v) for k, v in retrained.items()},
            "best_kldiv": float(best)}


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

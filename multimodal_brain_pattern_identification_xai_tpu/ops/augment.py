"""Train-time augmentation as jitted batched programs.

The reference augments spectrograms per sample on the host with
albumentations (``get_augmentations``, XAI_Multimodality.py:523-533,
applied in ``HMS_Spectrogram_Dataset.__getitem__`` :740-744):

* ``A.MixUp(reference_data, p=0.5)`` — blend with a random reference
  sample, mixing image AND label by λ ~ Beta(α, α);
* two ``A.CoarseDropout`` passes — one full-height stripe 6-10% wide
  (time masking) and one full-width stripe 6-10% tall (frequency
  masking), each with p=0.5, zero-filled.

Here the whole batch is augmented in ONE XLA program driven by a PRNG
key: per-sample Bernoulli gates, Beta mixing weights, and stripe masks
built from ``iota`` comparisons (static shapes — no dynamic slicing).
The EEG-branch mirror augmentation lives in
:func:`..ops.preprocess.mirror_eeg`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .. import config as C


def _stripe_mask(key: jax.Array, batch: int, size: int,
                 frac: Tuple[float, float], prob: float) -> jnp.ndarray:
    """(B, size) boolean keep-out mask: one random stripe of relative
    extent U[frac] at a uniform position, active with ``prob`` per sample
    (CoarseDropout hole geometry)."""
    kw, kp, kg = jax.random.split(key, 3)
    width = jax.random.uniform(kw, (batch,), minval=frac[0],
                               maxval=frac[1]) * size
    start = jax.random.uniform(kp, (batch,)) * (size - width)
    gate = jax.random.bernoulli(kg, prob, (batch,))
    pos = jnp.arange(size, dtype=jnp.float32)[None, :]
    inside = (pos >= start[:, None]) & (pos < (start + width)[:, None])
    return inside & gate[:, None]


def spectrogram_augment(key: jax.Array, spec: jnp.ndarray, y: jnp.ndarray,
                        ref_spec: jnp.ndarray, ref_y: jnp.ndarray,
                        cfg: C.SpecAugmentConfig = C.SpecAugmentConfig()
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched MixUp + time/freq CoarseDropout.

    Args:
        key: PRNG key (fold in the step counter upstream).
        spec: (B, 3, H, W) preprocessed spectrograms in [0, 1].
        y: (B, n_classes) soft targets.
        ref_spec / ref_y: reference pool to mix against (the reference
            builds it from a train-loader sweep,
            ``create_reference_data_loader`` XAI_Multimodality.py:508-518;
            passing the batch itself shuffled is the in-batch variant).

    Returns augmented ``(spec, y)``.
    """
    B = spec.shape[0]
    k_lam, k_gate, k_pick, k_time, k_freq = jax.random.split(key, 5)

    # --- MixUp ---------------------------------------------------------
    lam = jax.random.beta(k_lam, cfg.mixup_alpha, cfg.mixup_alpha, (B,))
    gate = jax.random.bernoulli(k_gate, cfg.mixup_prob, (B,))
    lam = jnp.where(gate, lam, 1.0).astype(spec.dtype)
    pick = jax.random.randint(k_pick, (B,), 0, ref_spec.shape[0])
    lam4 = lam[:, None, None, None]
    spec = lam4 * spec + (1.0 - lam4) * ref_spec[pick]
    y = lam[:, None] * y + (1.0 - lam[:, None]) * ref_y[pick]

    # --- CoarseDropout stripes ------------------------------------------
    H, W = spec.shape[-2], spec.shape[-1]
    t_mask = _stripe_mask(k_time, B, W, cfg.stripe_frac, cfg.dropout_prob)
    f_mask = _stripe_mask(k_freq, B, H, cfg.stripe_frac, cfg.dropout_prob)
    keep = (~t_mask[:, None, None, :]) & (~f_mask[:, None, :, None])
    return spec * keep.astype(spec.dtype), y

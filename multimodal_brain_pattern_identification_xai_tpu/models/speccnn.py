"""Spectrogram 2D-CNN (reference ``Spectrogram_Model``, models.py:42-107):
five conv blocks with pooled skip connections → GAP → FC → log-softmax."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import (SpectrogramBlock, adaptive_avg_pool_1x1, log_softmax,
                     nchw_to_nhwc)


class SpectrogramCNN(nn.Module):
    """Input (B, 3, 400, 300) NCHW → (B, num_classes) log-probs."""
    num_classes: int = 6
    widths: tuple = (16, 32, 64, 128, 256)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nchw_to_nhwc(x)
        pools = ("max", "avg", "max", "avg", "max")
        for i, (w, p) in enumerate(zip(self.widths, pools)):
            x = SpectrogramBlock(w, pool_type=p, name=f"block{i+1}")(x, train)
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        x = adaptive_avg_pool_1x1(x)
        x = nn.Dense(self.num_classes, name="fc")(x)
        return log_softmax(x)

"""Spectrogram 2D-CNN (reference ``Spectrogram_Model``, models.py:42-107):
five conv blocks with pooled skip connections → GAP → FC → log-softmax."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import (SpectrogramBlock, adaptive_avg_pool_1x1, log_softmax,
                     nchw_to_nhwc)


class SpectrogramCNN(nn.Module):
    """Input (B, 3, 400, 300) NCHW → (B, num_classes) log-probs.

    ``dtype=jnp.bfloat16`` enables the bf16 serving mode: halves the HBM
    traffic of the 400×300 activations (params and the softmax stay f32;
    probability deviation vs f32 is pinned by a test)."""
    num_classes: int = 6
    widths: tuple = (16, 32, 64, 128, 256)
    #: per-block pool types (models.py:42-77) — exposed so external
    #: per-block instrumentation (bench.py --breakdown) reads the real
    #: sequence instead of duplicating it
    pools: tuple = ("max", "avg", "max", "avg", "max")
    dtype: Any = None
    #: serve the first N blocks through the fused phase-packed Pallas
    #: kernel (ops/pallas_specblock.py) — serving opt-in (training keeps
    #: XLA convs; input gradients flow via the kernel's custom VJP);
    #: params are identical to the unfused model
    fused_blocks: int = 0
    #: passthrough to SpectrogramBlock.fused_interpret (None = auto by
    #: default backend; set when the apply-time device differs from it)
    fused_interpret: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nchw_to_nhwc(x)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, (w, p) in enumerate(zip(self.widths, self.pools)):
            x = SpectrogramBlock(w, pool_type=p, dtype=self.dtype,
                                 fused=i < self.fused_blocks,
                                 fused_interpret=self.fused_interpret,
                                 name=f"block{i+1}")(x, train)
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        x = adaptive_avg_pool_1x1(x).astype(jnp.float32)
        x = nn.Dense(self.num_classes, name="fc")(x)
        return log_softmax(x)

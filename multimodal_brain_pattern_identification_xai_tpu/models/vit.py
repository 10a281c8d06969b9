"""SpectrogramViT — ViT-B/16 over (400, 300) spectrograms (reference
``SpectrogramViT``, models.py:689-715, which wraps torchvision's
``vit_b_16`` with re-sized positional embeddings and a 6-class
log-softmax head).

Implemented natively: patchify-as-conv, learned positional embeddings for
the 25×18 = 450-patch grid (+CLS), pre-LN transformer encoder (ViT uses
pre-norm, GELU MLP), CLS-token classification head.  Pretrained ImageNet
weights are not bundled (this environment has no network egress);
``load_torch_vit_weights`` converts a torchvision state dict when one is
available on disk.

Attention weights are sown per layer for attention-rollout attribution
(BASELINE.json config #4).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import log_softmax, nchw_to_nhwc


class ViTEncoderLayer(nn.Module):
    """Pre-LN transformer block: LN→MHSA→res, LN→MLP(GELU)→res."""
    dim: int
    n_heads: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-6, name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.dim,
            dropout_rate=self.dropout, deterministic=not train,
            name="self_attention")(h, h, sow_weights=True)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.LayerNorm(epsilon=1e-6, name="ln_2")(x)
        h = nn.Dense(self.mlp_dim, name="mlp_0")(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim, name="mlp_3")(h)
        return x + nn.Dropout(self.dropout, deterministic=not train)(h)


class SpectrogramViT(nn.Module):
    """Input (B, 3, H, W) NCHW → (B, num_classes) log-probs."""
    num_classes: int = 6
    image_size: Tuple[int, int] = (400, 300)
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    n_heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # The reference keeps torchvision's 16×16 patching; 400×300 is not
        # divisible by 16 along W, torchvision conv floors → 25×18 patches.
        x = nchw_to_nhwc(x)
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="conv_proj")(x)
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        cls = self.param("class_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)
        pos = self.param("pos_embedding",
                         nn.initializers.normal(0.02),
                         (1, gh * gw + 1, self.dim))
        x = x + pos
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.depth):
            x = ViTEncoderLayer(self.dim, self.n_heads, self.mlp_dim,
                                self.dropout, name=f"encoder_layer_{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, name="ln")(x)
        self.sow("intermediates", "cls_tokens", x)
        cls_out = x[:, 0]
        logits = nn.Dense(self.num_classes, name="head")(cls_out)
        return log_softmax(logits)

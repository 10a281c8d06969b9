"""Dilated-Inception WaveNet (reference models.py:735-966).

TPU-native redesign of the reference forward pass: the reference applies
the *shared* ``wave_module`` sequentially eight times, once per montage
channel (models.py:942-957).  Here the eight channels are folded into the
batch axis and the module runs **once** on a (8·B)-sample batch — same
weights, same math, 8× bigger matmuls for the MXU and one compiled program
instead of eight.

Output is raw logits (no log-softmax) exactly like the reference, which
pairs this model with ``KLDivWithLogitsLoss`` (training_utils.py:165-175).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class DilatedInception(nn.Module):
    """Parallel dilated convs with kernels (2,3,6,7), channel-split output
    (models.py:652-712 ``_DilatedInception``).  NHWC, conv over W."""
    out_channels: int
    kernel_sizes: Tuple[int, ...] = (2, 3, 6, 7)
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h_dim = self.out_channels // len(self.kernel_sizes)
        outs = [
            nn.Conv(h_dim, (1, k), padding="SAME",
                    kernel_dilation=(1, self.dilation), name=f"conv_k{k}")(x)
            for k in self.kernel_sizes
        ]
        return jnp.concatenate(outs, axis=-1)


class GatedTCN(nn.Module):
    """tanh ⊙ sigmoid gated temporal conv (models.py:601-648 ``_GatedTCN``)."""
    h_dim: int
    dilation: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        filt = DilatedInception(self.h_dim, dilation=self.dilation,
                                name="filt")(x)
        gate = DilatedInception(self.h_dim, dilation=self.dilation,
                                name="gate")(x)
        return jnp.tanh(filt) * nn.sigmoid(gate)


class WaveBlock(nn.Module):
    """1×1 in-conv + n_layers of (gated TCN → 1×1 skip conv) with additive
    skip accumulation (models.py:540-597 ``_WaveBlock``)."""
    n_layers: int
    h_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.h_dim, (1, 1),
                    kernel_init=nn.initializers.xavier_uniform(),
                    bias_init=nn.initializers.zeros, name="in_conv")(x)
        x_skip = x
        for layer in range(self.n_layers):
            x = GatedTCN(self.h_dim, dilation=2 ** layer,
                         name=f"gated_tcn_{layer}")(x)
            x = nn.Conv(self.h_dim, (1, 1),
                        kernel_init=nn.initializers.xavier_uniform(),
                        bias_init=nn.initializers.zeros,
                        name=f"skip_conv_{layer}")(x)
            x_skip = x_skip + x
        return x_skip


class DilatedInceptionWaveNet(nn.Module):
    """Full model (models.py:849-966).

    Input ``(B, L, 8)`` — the Chris-magic-8 bipolar channels in the order
    (LL₁, LL₂, RL₁, RL₂, LP₁, LP₂, RP₁, RP₂) — or the reference's
    ``{"x": ...}`` dict.  Returns raw logits ``(B, n_classes)``.
    """
    n_classes: int = 6
    block_layers: Tuple[int, ...] = (12, 8, 4, 1)
    block_dims: Tuple[int, ...] = (16, 32, 64, 64)

    @nn.compact
    def __call__(self, inputs, train: bool = False) -> jnp.ndarray:
        x = inputs["x"] if isinstance(inputs, dict) else inputs
        b, length, n_ch = x.shape
        # Fold channels into batch: (B, L, C) → (B·C, 1, L, 1) NHWC.
        x = jnp.transpose(x, (0, 2, 1)).reshape(b * n_ch, 1, length, 1)
        for i, (n_layers, h_dim) in enumerate(
                zip(self.block_layers, self.block_dims)):
            x = WaveBlock(n_layers, h_dim, name=f"wave_block_{i}")(x)
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        pooled = jnp.mean(x, axis=(1, 2))                 # GAP → (B·C, 64)
        pooled = pooled.reshape(b, n_ch, -1)
        # Brain-region averaging over channel pairs (models.py:942-961).
        regions = pooled.reshape(b, n_ch // 2, 2, -1).mean(axis=2)
        feats = regions.reshape(b, -1)                    # (B, 4·64)
        h = nn.relu(nn.Dense(64, name="output_0")(feats))
        return nn.Dense(self.n_classes, name="output_2")(h)

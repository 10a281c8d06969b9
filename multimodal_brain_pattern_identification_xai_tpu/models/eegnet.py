"""EEGNet family — raw-EEG 2D-CNN classifiers (reference models.py:109-685,
XAI_Multimodality.py:971-1076), re-implemented as flax modules in NHWC.

All models take the reference input layout ``(B, 1, Chans, Samples)``
(default (B, 1, 37, 3000)) and return log-probabilities ``(B, n_classes)``.
Every model exposes ``features`` / ``head`` methods as XAI cut points.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (Attention, BiLSTM, LSTM, TransformerEncoderLayer,
                     avg_pool, batch_norm, flatten_nchw, log_softmax,
                     nchw_to_nhwc)


class _EEGNetStem(nn.Module):
    """Blocks 1–2 shared by all EEGNet variants (models.py:247-268):
    temporal conv (1, kernLength) → BN → depthwise (Chans, 1) → BN → ELU →
    avgpool (1,4) → dropout → "separable" conv (1,16) → BN.

    Input NHWC (B, Chans, Samples, 1); output NHWC (B, 1, Samples/4, F2)
    pre-activation (variants differ in what follows batchnorm3).
    """
    chans: int = 37
    kern_length: int = 64
    f1: int = 8
    d: int = 2
    f2: int = 16
    dropout_rate: float = 0.5
    #: inference-time operator reassociation (exact; see below)
    fused_inference: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        conv1 = nn.Conv(self.f1, (1, self.kern_length), padding="SAME",
                        use_bias=False, name="conv1")
        bn1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="bn1")
        # Depthwise (Chans, 1) conv with groups=F1, expressed as an einsum
        # contraction over the channel-height axis: (a) it maps onto the
        # MXU as one dense contraction instead of F1 skinny grouped convs,
        # and (b) XLA's SPMD partitioner mis-shards grouped-conv *gradients*
        # on multi-axis meshes (silently zeroing them — caught by
        # tests/test_parallel.py), which the einsum form avoids entirely.
        dw_kernel = self.param(
            "depthwiseConv_kernel",
            nn.initializers.lecun_normal(),
            (self.chans, self.f1, self.d))

        if train or not self.fused_inference:
            # canonical order: temporal conv → BN → channel contraction
            u = conv1(x)                                  # (B, H, T, F1)
            u = bn1(u)
            v = jnp.einsum("bhtg,hgd->btgd", u, dw_kernel)
            v = v.reshape(v.shape[0], 1, v.shape[1], self.f1 * self.d)
        else:
            # Inference reassociation (exact): the (1, kern) temporal conv
            # is per-group and the depthwise stage only contracts the
            # channel-height axis, so they commute; BN1 with running stats
            # is a per-group affine that folds through the contraction.
            # This avoids materializing the (B, Chans, T, F1) intermediate
            # (~900 MB at batch 256) — ~10× less HBM traffic and FLOPs.
            # BN affine extracted via a 2-point probe (bn(1)-bn(0), bn(0)).
            probe = jnp.concatenate(
                [jnp.zeros((1, 1, 1, self.f1), x.dtype),
                 jnp.ones((1, 1, 1, self.f1), x.dtype)], axis=2)
            bp = bn1(probe)
            o_g = bp[0, 0, 0]                             # (F1,)
            s_g = bp[0, 0, 1] - o_g                       # (F1,)

            # materialize conv1's params via a dummy call (so init through
            # this path builds the same tree as the train path), then use
            # its kernel taps directly
            _ = conv1(jnp.zeros((1, 1, self.kern_length, 1), x.dtype))
            w1 = conv1.variables["params"]["kernel"]      # (1, k, 1, F1)
            k_taps = w1[0, :, 0, :]                       # (kern, F1)
            # channel contraction first: z[b,t,g,d] = Σ_h x[b,h,t] K[h,g,d]
            z = jnp.einsum("bht,hgd->btgd", x[..., 0], dw_kernel)
            B, T = z.shape[0], z.shape[1]
            z = z.reshape(B, T, self.f1 * self.d)
            # per-group temporal conv, expressed as a dense conv with a
            # diagonal channel mixing (identical math; F1·D=16 channels is
            # tiny, and dense convs avoid both the grouped-conv gradient
            # partitioner bug and pathologically slow grouped-conv
            # compiles observed on TPU toolchains)
            taps = jnp.repeat(k_taps, self.d, axis=-1)    # (kern, F1·D)
            eye = jnp.eye(self.f1 * self.d, dtype=taps.dtype)
            dense = taps[:, None, :] * eye[None, :, :]    # (kern, C, C)
            z = jax.lax.conv_general_dilated(
                z, dense, (1,), "SAME",
                dimension_numbers=("NHC", "HIO", "NHC"))
            # affine after both contractions:
            #   v[g,d] = s_g · z[g,d] + o_g · Σ_h K[h,g,d]
            sumK = jnp.sum(dw_kernel, axis=0).reshape(-1)  # (F1·D,)
            scale = jnp.repeat(s_g, self.d)                # (F1·D,)
            bias = jnp.repeat(o_g, self.d) * sumK          # (F1·D,)
            v = (scale * z + bias).reshape(B, 1, T, self.f1 * self.d)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(v)
        x = nn.elu(x)
        x = avg_pool(x, (1, 4))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        stem_out = x                                  # residual tap point
        x = nn.Conv(self.f2, (1, 16), padding="SAME", use_bias=False,
                    name="separableConv")(x)
        x = batch_norm(train)(x)
        return x, stem_out


class EEGNet(nn.Module):
    """Vanilla EEGNet (models.py:239-289)."""
    nb_classes: int = 6
    chans: int = 37
    samples: int = 3000
    dropout_rate: float = 0.5
    kern_length: int = 64
    f1: int = 8
    d: int = 2
    f2: int = 16

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nchw_to_nhwc(x)                           # (B, Chans, T, 1)
        x, _ = _EEGNetStem(self.chans, self.kern_length, self.f1, self.d,
                           self.f2, self.dropout_rate, name="stem")(x, train)
        x = nn.elu(x)
        x = avg_pool(x, (1, 8))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        return x

    def head(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = flatten_nchw(x)
        x = nn.Dense(self.nb_classes, name="dense")(x)
        return log_softmax(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.features(x, train), train)


class EEGNetAttentionRegularized(nn.Module):
    """EEGNet + single-head attention over time tokens + MLP head — the
    notebook's EEG branch of the 97%-accuracy multimodal model
    (XAI_Multimodality.py:990-1076).  ``weight_decay`` mirrors the manual
    L2 term the reference adds to the loss (applied by the trainer)."""
    nb_classes: int = 6
    chans: int = 37
    samples: int = 3000
    dropout_rate: float = 0.5
    kern_length: int = 64
    f1: int = 8
    d: int = 2
    f2: int = 16
    weight_decay: float = 1e-3

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nchw_to_nhwc(x)
        x, _ = _EEGNetStem(self.chans, self.kern_length, self.f1, self.d,
                           self.f2, self.dropout_rate, name="stem")(x, train)
        x = nn.elu(x)
        x = avg_pool(x, (1, 8))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        return x                                       # (B, 1, T', F2)

    def head(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)                # (B, L, F2)
        tokens, _ = Attention(self.f2, name="attention_layer")(tokens)
        x = tokens.reshape(b, h, w, c)
        x = flatten_nchw(x)
        x = nn.Dense(128, name="dense1")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.nb_classes, name="dense2")(x)
        return log_softmax(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.features(x, train), train)


class EEGNetAttentionDeep(nn.Module):
    """EEGNet + third conv block + attention (models.py:137-235)."""
    nb_classes: int = 6
    chans: int = 37
    samples: int = 3000
    dropout_rate: float = 0.5
    kern_length: int = 64
    f1: int = 8
    d: int = 2
    f2: int = 16
    f3: int = 32

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nchw_to_nhwc(x)
        x, _ = _EEGNetStem(self.chans, self.kern_length, self.f1, self.d,
                           self.f2, self.dropout_rate, name="stem")(x, train)
        x = nn.elu(x)
        x = avg_pool(x, (1, 8))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Conv(self.f3, (1, 16), padding="SAME", use_bias=False,
                    name="conv2")(x)
        x = batch_norm(train)(x)
        x = nn.elu(x)
        x = avg_pool(x, (1, 8))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        return x

    def head(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens, _ = Attention(self.f3, name="attention_layer")(tokens)
        x = tokens.reshape(b, h, w, c)
        x = flatten_nchw(x)
        x = nn.Dense(128, name="dense1")(x)
        x = nn.Dense(self.nb_classes, name="dense2")(x)
        return log_softmax(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.features(x, train), train)


class _ResidualTail(nn.Module):
    """Block-2 residual path shared by EEGNetResidual(+LSTM)
    (models.py:414-420): 1×1 conv stride (1,2) → BN → avgpool (1,4)."""
    f2: int

    @nn.compact
    def __call__(self, residual: jnp.ndarray, train: bool = False):
        r = nn.Conv(self.f2, (1, 1), strides=(1, 2), use_bias=False,
                    name="residual_conv")(residual)
        r = batch_norm(train)(r)
        return avg_pool(r, (1, 4))


class EEGNetResidual(nn.Module):
    """EEGNet with a strided-1×1-conv residual around block 2
    (models.py:383-455)."""
    nb_classes: int = 6
    chans: int = 37
    samples: int = 3000
    dropout_rate: float = 0.5
    kern_length: int = 64
    f1: int = 8
    d: int = 2
    f2: int = 16

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nchw_to_nhwc(x)
        x, stem_out = _EEGNetStem(self.chans, self.kern_length, self.f1,
                                  self.d, self.f2, self.dropout_rate,
                                  name="stem")(x, train)
        x = nn.elu(x)
        x = avg_pool(x, (1, 8))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = x + _ResidualTail(self.f2, name="residual")(stem_out, train)
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        return x

    def head(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = flatten_nchw(x)
        x = nn.Dense(self.nb_classes, name="dense")(x)
        return log_softmax(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.features(x, train), train)


class EEGNetResidualLSTM(nn.Module):
    """EEGNetResidual + LSTM(64) over the time tokens (models.py:457-537)."""
    nb_classes: int = 6
    chans: int = 37
    samples: int = 3000
    dropout_rate: float = 0.5
    kern_length: int = 64
    f1: int = 8
    d: int = 2
    f2: int = 16
    lstm_units: int = 64

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nchw_to_nhwc(x)
        x, stem_out = _EEGNetStem(self.chans, self.kern_length, self.f1,
                                  self.d, self.f2, self.dropout_rate,
                                  name="stem")(x, train)
        x = nn.elu(x)
        x = avg_pool(x, (1, 8))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = x + _ResidualTail(self.f2, name="residual")(stem_out, train)
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        return x

    def head(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape                            # h == 1
        tokens = x.reshape(b, h * w, c)                 # (B, T', F2)
        seq = LSTM(self.lstm_units, name="lstm")(tokens)
        x = seq.reshape(b, -1)
        x = nn.Dense(self.nb_classes, name="dense")(x)
        return log_softmax(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.features(x, train), train)


class EEGNetTransformer(nn.Module):
    """Three conv blocks → flattened token → transformer encoder → MLP head
    (models.py:540-629).

    Deviation noted for the record: the reference feeds the token tensor in
    torch's seq-first layout without ``batch_first``, which silently
    attends *across the batch*; here the encoder is batch-first with a
    per-sample single token (the mathematically intended model).
    """
    nb_classes: int = 6
    chans: int = 37
    samples: int = 3000
    dropout_rate: float = 0.5
    kern_length: int = 64
    f1: int = 16
    d: int = 4
    f2: int = 32
    num_heads: int = 8
    num_layers: int = 4

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nchw_to_nhwc(x)
        x, _ = _EEGNetStem(self.chans, self.kern_length, self.f1, self.d,
                           self.f2, self.dropout_rate, name="stem")(x, train)
        x = nn.elu(x)
        x = avg_pool(x, (1, 8))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Conv(self.f2 * 2, (1, 8), padding="SAME", use_bias=False,
                    name="separableConv2")(x)
        x = batch_norm(train)(x)
        x = nn.elu(x)
        x = avg_pool(x, (1, 4))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        return x

    def head(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # d_model is the actual flattened conv-trunk size f2·2·(samples/128).
        # (The reference computes ``Samples // 64`` at models.py:574-579,
        # inconsistent with its own 4·8·4 pooling — that variant cannot run
        # as written; the working formula is used here.)
        b = x.shape[0]
        d_model = self.f2 * 2 * (self.samples // 128)
        tok = flatten_nchw(x).reshape(b, 1, d_model)
        for i in range(self.num_layers):
            tok = TransformerEncoderLayer(
                d_model, self.num_heads, dropout=self.dropout_rate,
                name=f"encoder_{i}")(tok, train)
        x = tok[:, 0]
        x = nn.relu(nn.Dense(256, name="dense1")(x))
        x = nn.relu(nn.Dense(128, name="dense2")(x))
        x = nn.Dense(self.nb_classes, name="fc_output")(x)
        return log_softmax(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.features(x, train), train)


class EEGSeizureDetectionModel(nn.Module):
    """Two conv blocks → 2-layer BiLSTM(128) → FC (models.py:631-685)."""
    nb_classes: int = 6
    chans: int = 37
    samples: int = 3000
    dropout_rate: float = 0.5

    def features(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nchw_to_nhwc(x)
        # torch Conv2d(1,16,(1,64),padding=(0,32)) — explicit symmetric pad
        x = nn.Conv(16, (1, 64), padding=((0, 0), (32, 32)), name="conv1")(x)
        x = batch_norm(train)(x)
        x = nn.elu(x)
        x = avg_pool(x, (1, 4))
        x = nn.Conv(32, (1, 32), padding=((0, 0), (16, 16)), name="conv2")(x)
        x = batch_norm(train)(x)
        x = nn.elu(x)
        x = avg_pool(x, (1, 4))
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        return x

    def head(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b = x.shape[0]
        seq = flatten_nchw(x).reshape(b, 1, -1)       # single timestep
        h = BiLSTM(128, name="lstm1")(seq)
        h = BiLSTM(128, name="lstm2")(h)
        x = h[:, -1, :]
        x = nn.Dense(64, name="fc1")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.nb_classes, name="fc2")(x)
        return log_softmax(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.head(self.features(x, train), train)

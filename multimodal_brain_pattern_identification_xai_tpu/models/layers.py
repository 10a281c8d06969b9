"""Shared building blocks for the model zoo.

Conventions (TPU-native):

* Public model ``__call__`` signatures accept the reference's NCHW layouts
  — EEG ``(B, 1, 37, 3000)``, spectrogram ``(B, 3, 400, 300)`` — for API
  parity, and immediately move to NHWC internally (XLA's preferred conv
  layout on TPU; the ingress transpose fuses away).
* BatchNorm matches torch defaults (eps 1e-5, momentum 0.1 → flax
  ``momentum=0.9``); running stats live in the ``batch_stats`` collection.
* ``flatten_nchw`` reproduces torch's channel-major flatten ordering so
  dense-layer weights are layout-compatible with the reference.
* Models expose ``features(x)`` / ``head(feats)`` split points so the XAI
  stack (Grad-CAM et al.) can differentiate w.r.t. feature maps without
  framework hooks.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch-compatible defaults
BN = lambda: nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)


def batch_norm(train: bool) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5)


def nchw_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (0, 3, 1, 2))


def flatten_nchw(x_nhwc: jnp.ndarray) -> jnp.ndarray:
    """Flatten an NHWC tensor in torch's NCHW element order."""
    b = x_nhwc.shape[0]
    return nhwc_to_nchw(x_nhwc).reshape(b, -1)


def avg_pool(x: jnp.ndarray, window: Tuple[int, int]) -> jnp.ndarray:
    """torch AvgPool2d(window) — stride = window, VALID (floor) semantics."""
    return nn.avg_pool(x, window, strides=window, padding="VALID")


def _lerp_axis(x: jnp.ndarray, n_out: int, axis: int) -> jnp.ndarray:
    """2-tap linear interpolation at half-pixel centers along one axis
    (torch align_corners=False, NO anti-alias filter)."""
    n_in = x.shape[axis]
    if n_in == n_out:
        return x
    if n_in == 2 * n_out:
        # exact-half case: positions land at 2i+0.5 → the lerp is exactly
        # the mean of each adjacent pair; a reshape-mean fuses cleanly
        # instead of two gathers (this is every even-sized block of the
        # spectrogram CNN skip path, incl. the big 400×300 early planes)
        shape = list(x.shape)
        shape[axis] = n_out
        shape.insert(axis + 1, 2)
        return x.reshape(shape).mean(axis=axis + 1)
    pos = jnp.clip((jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5,
                   0.0, n_in - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_in - 1)
    shape = [1] * x.ndim
    shape[axis] = n_out
    w = (pos - lo).astype(x.dtype).reshape(shape)
    return (jnp.take(x, lo, axis=axis) * (1.0 - w)
            + jnp.take(x, hi, axis=axis) * w)


def bilinear_interpolate_nhwc(x: jnp.ndarray,
                              size: Tuple[int, int]) -> jnp.ndarray:
    """torch ``F.interpolate(mode='bilinear', align_corners=False)`` on an
    NHWC tensor — a separable 2-tap lerp per axis.  NOT
    ``jax.image.resize``: that applies an anti-aliasing prefilter when
    downscaling, which torch's default (antialias=False) does not — the
    two visibly diverge on every 2× downsample."""
    return _lerp_axis(_lerp_axis(x, size[0], 1), size[1], 2)


def max_pool(x: jnp.ndarray, window: Tuple[int, int]) -> jnp.ndarray:
    return nn.max_pool(x, window, strides=window, padding="VALID")


def adaptive_avg_pool_1x1(x_nhwc: jnp.ndarray) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d((1,1)): global mean over H, W."""
    return jnp.mean(x_nhwc, axis=(1, 2))


def log_softmax(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.log_softmax(x, axis=-1)


class Attention(nn.Module):
    """Single-head scaled-dot attention over a token axis
    (reference ``Attention``, models.py:109-135).

    Input (B, L, D_in) → (output (B, L, D_attn), weights (B, L, L)).
    """
    attention_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        q = nn.Dense(self.attention_dim, name="query")(x)
        k = nn.Dense(self.attention_dim, name="key")(x)
        v = nn.Dense(self.attention_dim, name="value")(x)
        scores = jnp.einsum("bld,bmd->blm", q, k) * self.attention_dim ** -0.5
        weights = jax.nn.softmax(scores, axis=-1)
        self.sow("intermediates", "attention_weights", weights)
        out = jnp.einsum("blm,bmd->bld", weights, v)
        return out, weights


class _Conv3x3Params(nn.Module):
    """Parameter shell for one 3×3 conv: declares the same variables as
    ``nn.Conv`` (kernel HWIO + bias, same names/shapes/inits) so the fused
    serving path is checkpoint-interchangeable with the unfused one."""
    features: int

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, cin, self.features))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.features,))
        return k, b


class SpectrogramBlock(nn.Module):
    """The 5-block spectrogram CNN's building block (models.py:42-77):
    3× conv3x3+ReLU → pool → BN → dropout, with a bilinear-resized
    1×1-conv skip connection.  NHWC.  ``dtype`` sets the compute dtype
    (bf16 halves the HBM traffic of the fat early activations; params stay
    f32).

    ``fused=True`` routes the conv×3+pool chain through the phase-packed
    Pallas kernel (:mod:`..ops.pallas_specblock`) at inference; training
    keeps the XLA convs.  The fused path uses the kernel's custom-VJP
    wrapper, so input-gradient XAI (saliency/IG/SHAP) differentiates
    through fused-serving models (backward = vjp of the equivalent XLA
    chain).  Parameters are identical either way."""
    out_channels: int
    pool_type: str = "max"
    pool_size: Tuple[int, int] = (2, 2)
    dropout_p: float = 0.5
    dtype: Any = None
    fused: bool = False
    #: None = interpret the Pallas kernel unless the default backend is a
    #: real TPU; set explicitly when the apply-time device differs from
    #: the default backend (e.g. jax.default_device(cpu) on a TPU host)
    fused_interpret: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from ..ops import pallas_specblock as psb

        identity = x
        cfg = (psb.choose_fused_config(*x.shape[1:3], self.out_channels)
               if self.fused and not train and self.pool_size == (2, 2)
               else None)
        if cfg is not None:
            cin = x.shape[-1]
            ks, bs = zip(*[
                _Conv3x3Params(self.out_channels, name=f"conv{i+1}")(
                    cin if i == 0 else self.out_channels)
                for i in range(3)])
            interp = self.fused_interpret
            if interp is None:
                # Mosaic kernels only lower on a real TPU; everywhere else
                # (cpu, gpu) degrade to interpret mode instead of a
                # lowering crash.  default_backend() avoids jax.devices()
                # (which can block when a remote backend's transport is
                # down) — same platform string, no device enumeration.
                interp = jax.default_backend() not in ("tpu", "axon")
            x = psb.fused_specblock_convpool_vjp(
                x, ks, bs, pool=self.pool_type, pack_w=cfg[0],
                strip_rows=cfg[1], dtype=self.dtype or x.dtype,
                interpret=interp)
        else:
            for i in range(3):
                x = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            dtype=self.dtype, name=f"conv{i+1}")(x)
                x = nn.relu(x)
            pool = max_pool if self.pool_type == "max" else avg_pool
            x = pool(x, self.pool_size)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout_p, deterministic=not train)(x)
        if identity.shape != x.shape:
            # torch-exact skip resize (models.py:73-74 F.interpolate
            # bilinear, align_corners=False): 2-tap lerp, no anti-alias —
            # jax.image.resize prefilters downscales and diverges
            identity = bilinear_interpolate_nhwc(identity, x.shape[1:3])
            identity = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv1x1")(identity)
        return x + identity


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch ``TransformerEncoderLayer``
    defaults: ReLU feed-forward 2048, post-norm), batch-first.

    The reference feeds a single flattened token (models.py:617-619); this
    layer handles arbitrary (B, L, D) and sows attention weights for
    attention-rollout XAI.
    """
    d_model: int
    n_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train,
            name="self_attn")
        # sow weights for rollout: recompute cheaply via sow inside module
        a = attn(x, x, sow_weights=True)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(
            x + nn.Dropout(self.dropout, deterministic=not train)(a))
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, name="linear2")(h)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(
            x + nn.Dropout(self.dropout, deterministic=not train)(h))
        return x


class LSTM(nn.Module):
    """Unidirectional LSTM over (B, T, D) returning full sequence, matching
    torch ``nn.LSTM(batch_first=True)`` output conventions."""
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        rnn = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="rnn")
        return rnn(x)


class BiLSTM(nn.Module):
    """Bidirectional LSTM, concatenated hidden states."""
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), name="fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden), reverse=True,
                     keep_order=True, name="bwd")
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)

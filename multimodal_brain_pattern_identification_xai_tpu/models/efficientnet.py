"""EfficientNet-B0 spectrogram encoder (BASELINE.json config #1; the
reference's CFG mentions the efficientnet preset family, main_2.py:37-51).

Standard B0 topology (MBConv with squeeze-excite, SiLU), NHWC, BatchNorm
with torch-compatible eps/momentum.  No pretrained weights are bundled
(zero-egress environment); the architecture trains from scratch or accepts
converted torchvision weights (``models.load_torch_efficientnet_state_dict``,
logit-exact).

TPU note (measured, PARITY.md): despite ~6.7× fewer FLOPs than the
5-block SpectrogramCNN at the same input, B0 is SLOWER on v5e (4.4k vs
6.7k fused multimodal windows/s) — depthwise convolutions do no MXU work
and the many thin layers + SE reductions are memory/latency-bound.  Use
SpectrogramCNN when throughput matters; B0 exists for reference parity
(the CFG preset, main_2.py:37-51).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import batch_norm, log_softmax, nchw_to_nhwc

# (expand_ratio, channels, repeats, stride, kernel)
B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


class SqueezeExcite(nn.Module):
    reduced: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.silu(nn.Conv(self.reduced, (1, 1), name="reduce")(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), name="expand")(s))
        return x * s


class MBConv(nn.Module):
    expand_ratio: int
    out_channels: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inp = x.shape[-1]
        mid = inp * self.expand_ratio
        identity = x
        if self.expand_ratio != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, name="expand_conv")(x)
            x = nn.silu(batch_norm(train)(x))
        # torch-style symmetric (k-1)//2 padding: identical to SAME at
        # stride 1, but at stride 2 SAME pads (0, 1) while torch pads
        # (p, p) — matching torch keeps imported torchvision weights
        # logit-exact (see torch_import.load_torch_efficientnet_state_dict)
        p = (self.kernel - 1) // 2
        x = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    feature_group_count=mid, use_bias=False,
                    name="depthwise_conv")(x)
        x = nn.silu(batch_norm(train)(x))
        x = SqueezeExcite(max(1, int(inp * self.se_ratio)), name="se")(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="project_conv")(x)
        x = batch_norm(train)(x)
        if self.stride == 1 and inp == self.out_channels:
            if self.drop_rate > 0:
                x = nn.Dropout(self.drop_rate, deterministic=not train,
                               broadcast_dims=(1, 2, 3))(x)
            x = x + identity
        return x


class FusedMBConv(nn.Module):
    """V2's early-stage block: the 1×1 expand + k×k depthwise pair fused
    into ONE regular k×k conv — exactly the change that matters on TPU
    (a dense conv is MXU work; a depthwise conv is not), which is why V2
    replaces MBConv with this in the high-resolution stages."""
    expand_ratio: int
    out_channels: int
    stride: int
    kernel: int
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inp = x.shape[-1]
        mid = inp * self.expand_ratio
        identity = x
        p = (self.kernel - 1) // 2
        if self.expand_ratio != 1:
            x = nn.Conv(mid, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((p, p), (p, p)), use_bias=False,
                        name="fused_conv")(x)
            x = nn.silu(batch_norm(train)(x))
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        name="project_conv")(x)
            x = batch_norm(train)(x)
        else:
            x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((p, p), (p, p)), use_bias=False,
                        name="fused_conv")(x)
            x = nn.silu(batch_norm(train)(x))
        if self.stride == 1 and inp == self.out_channels:
            if self.drop_rate > 0:
                x = nn.Dropout(self.drop_rate, deterministic=not train,
                               broadcast_dims=(1, 2, 3))(x)
            x = x + identity
        return x


# EfficientNetV2-B2 stage table: the V2 base config (fused early stages)
# with B2 scaling (width 1.1, depth 1.2) already applied via the standard
# round_filters(divisor=8)/ceil(repeats) rules — matches timm/keras
# efficientnetv2_b2 (stem 32; 16/32/56/104/120/208; head 1408).
# (block, expand_ratio, channels, repeats, stride, kernel)
V2_B2_STAGES = (
    ("fused", 1, 16, 2, 1, 3),
    ("fused", 4, 32, 3, 2, 3),
    ("fused", 4, 56, 3, 2, 3),
    ("mb", 4, 104, 4, 2, 3),
    ("mb", 6, 120, 6, 1, 3),
    ("mb", 6, 208, 10, 2, 3),
)


class EfficientNetV2B2(nn.Module):
    """EfficientNetV2-B2 — the preset the reference CFG names
    (``"efficientnetv2_b2_imagenet"``, main3.py:40; named but never
    constructed there — implemented here to close the inventory).

    Input (B, 3, H, W) NCHW → (B, num_classes) log-probs.  No pretrained
    weights bundled (zero-egress); trains from scratch.  V2's fused early
    stages are a better TPU fit than V1's all-depthwise pipeline (dense
    convs run on the MXU), though SpectrogramCNN remains the measured
    throughput choice at this input size (see module docstring)."""
    num_classes: int = 6

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nchw_to_nhwc(x)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem_conv")(x)
        x = nn.silu(batch_norm(train)(x))
        for si, (blk, e, c, r, s, k) in enumerate(V2_B2_STAGES):
            for ri in range(r):
                stride = s if ri == 0 else 1
                if blk == "fused":
                    x = FusedMBConv(e, c, stride, k,
                                    name=f"stage{si}_block{ri}")(x, train)
                else:
                    x = MBConv(e, c, stride, k,
                               name=f"stage{si}_block{ri}")(x, train)
        x = nn.Conv(1408, (1, 1), use_bias=False, name="head_conv")(x)
        x = nn.silu(batch_norm(train)(x))
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.3, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="classifier")(x)
        return log_softmax(x)


class EfficientNetB0(nn.Module):
    """Input (B, 3, H, W) NCHW → (B, num_classes) log-probs."""
    num_classes: int = 6
    width: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nchw_to_nhwc(x)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem_conv")(x)
        x = nn.silu(batch_norm(train)(x))
        for si, (e, c, r, s, k) in enumerate(B0_STAGES):
            for ri in range(r):
                x = MBConv(e, c, s if ri == 0 else 1, k,
                           name=f"stage{si}_block{ri}")(x, train)
        x = nn.Conv(1280, (1, 1), use_bias=False, name="head_conv")(x)
        x = nn.silu(batch_norm(train)(x))
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="classifier")(x)
        return log_softmax(x)

"""Legacy DiffEEG denoiser variant — the reference's OLDER diffusion
model (reference root/src/models/diffusion_model.py:8-167), superseded
there by ``diffEEG.py`` and imported by nothing, reproduced here so the
component inventory is closed at 52/52 rather than recording a skip.

Topology kept 1:1 with the dead-code original:

* sinusoidal step embedding + 3-layer ReLU MLP
  (diffusion_model.py:29-37,90-100);
* class embedding over argmax'd one-hot labels (:23,127-133);
* spectrogram conditioning: two ``ConvTranspose2d(k=3, s=2, p=1)``
  upsamplers with ReLU, a 1×1 Conv2d, then a flatten to
  ``(B, hidden, F'·T')`` that is ADDED to the time axis (:40-62,142-153)
  — the original silently requires ``F'·T' == T`` (torch broadcasting
  would raise); here that latent constraint is an explicit
  ``ValueError``;
* four chained "residual" Sequentials — conv1×1 → Tanh → dilated conv3
  → Sigmoid → conv1×1 → Dropout, dilations 1/2/4/8, with NO residual
  add and tanh/sigmoid applied in SERIES rather than gated
  (:79-88,156-159; the live ``diffEEG.py`` fixes both — this module
  reproduces the legacy behaviour, bug-for-bug);
* skip-sum 1×1 conv over x1+x2+x3+x4, then a 1×1 output projection
  (:74-77,162-165).

One DELIBERATE deviation from the literal original (third legacy quirk,
normalized rather than reproduced): the original expands ``step_emb`` to
``time_dim`` unpacked from ``spectrogram.shape`` (:116,124) while
``class_emb`` and ``input_conv(x)`` live on the EEG time axis
``x.shape[-1]`` (:133,153), so their sum (:153) only type-checks in the
degenerate case ``Ts == T`` — for any other shape the original is
unrunnable.  Here ``step_emb`` broadcasts on the EEG time axis ``T`` like
every other conditioning term, which makes the module well-defined under
the stated contract ``F'·T' == T``; the pinned torch reference
(``tests/torch_ref.py::make_torch_diffeeg_legacy``) encodes this
corrected semantics too, so the parity test pins the port against a
*corrected reimplementation*, not against the (unrunnable) literal
original.

Re-expressed on channel-last tensors (NHWC 2D convs, (B, T, C) 1D
convs) for TPU; torch-exact output parity is pinned by
tests/test_diffusion.py::test_torch_diffeeg_legacy_import_output_parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class _LegacyBlock(nn.Module):
    """conv1×1 → tanh → dilated conv3 → sigmoid → conv1×1 → Dropout
    (diffusion_model.py:79-88).  Not a true residual block and not a
    true GTU — the legacy original chains the nonlinearities."""
    channels: int
    dilation: int
    dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.tanh(nn.Conv(self.channels, (1,), name="conv_in")(x))
        # torch padding=dilation with k=3 ≡ flax SAME at the same dilation
        x = nn.sigmoid(nn.Conv(self.channels, (3,),
                               kernel_dilation=(self.dilation,),
                               padding="SAME", name="conv_dil")(x))
        x = nn.Conv(self.channels, (1,), name="conv_out")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class DiffEEGLegacy(nn.Module):
    """Legacy noise predictor ε̂(x_t, class, t, spectrogram).

    Args at call:
        x:    (B, n_channels, T) noisy EEG (reference layout).
        y:    (B, n_classes) one-hot class labels.
        t:    (B,) float diffusion steps.
        spec: (B, n_channels, F, Ts) STFT conditioning spectrograms;
              the two stride-2 upsamplers give F' = 4F−3, T' = 4Ts−3
              and the flattened F'·T' must equal T (the legacy
              architecture's implicit shape contract).
    Returns (B, n_channels, T) predicted noise.
    """
    n_classes: int = 6
    n_channels: int = 19
    hidden: int = 32
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, t: jnp.ndarray,
                 spec: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        H = self.hidden
        B, _, T = x.shape

        # ---- step embedding (diffusion_model.py:90-100) ---------------
        half = H // 2
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                        * (-np.log(10000.0) / (half - 1)))
        emb = t.astype(jnp.float32)[:, None] * freqs
        se = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        se = nn.relu(nn.Dense(H, name="step_mlp_0")(se))
        se = nn.relu(nn.Dense(H, name="step_mlp_2")(se))
        se = nn.Dense(H, name="step_mlp_4")(se)            # (B, H)

        # ---- class embedding (:127-133) -------------------------------
        labels = jnp.argmax(y, axis=-1)
        ce = nn.Embed(self.n_classes, H, name="class_embedding")(labels)

        # ---- spectrogram conditioning (:142-150) ----------------------
        s = jnp.transpose(spec, (0, 2, 3, 1))              # (B, F, Ts, C)
        # torch ConvTranspose2d(k=3, s=2, p=1): flax pads k−1−p = 1 per
        # side and does not flip the kernel (the importer flips); out
        # length = 2·in − 1 per axis, twice → 4·in − 3
        up = dict(strides=(2, 2), padding=((1, 1), (1, 1)))
        s = nn.relu(nn.ConvTranspose(H // 2, (3, 3), **up,
                                     name="spectrogram_upconv1")(s))
        s = nn.relu(nn.ConvTranspose(H, (3, 3), **up,
                                     name="spectrogram_upconv2")(s))
        s = nn.Conv(H, (1, 1), name="spectrogram_embed")(s)
        L = s.shape[1] * s.shape[2]
        if L != T:
            raise ValueError(
                f"legacy DiffEEG shape contract: flattened upsampled "
                f"spectrogram length {s.shape[1]}x{s.shape[2]}={L} must "
                f"equal the EEG time dim {T} (diffusion_model.py:150-153 "
                f"adds them; pick Ts=(T+3)/4 with F=1)")
        # torch .view(B, H, −1) flattens (F', T') row-major — identical
        # to reshaping our (B, F', T', H) over the two spatial axes
        s = s.reshape(B, L, H)                             # (B, T, H)

        # ---- trunk (:153-165) -----------------------------------------
        xt = jnp.transpose(x, (0, 2, 1))                   # (B, T, C)
        h = (nn.Conv(H, (1,), name="input_conv")(xt)
             + se[:, None, :] + ce[:, None, :] + s)
        x1 = _LegacyBlock(H, 1, self.dropout, name="res_block1")(h, train)
        x2 = _LegacyBlock(H, 2, self.dropout, name="res_block2")(x1, train)
        x3 = _LegacyBlock(H, 4, self.dropout, name="res_block3")(x2, train)
        x4 = _LegacyBlock(H, 8, self.dropout, name="res_block4")(x3, train)
        out = nn.Conv(H, (1,), name="skip_sum")(x1 + x2 + x3 + x4)
        out = nn.Conv(self.n_channels, (1,), name="output_conv")(out)
        return jnp.transpose(out, (0, 2, 1))               # (B, C, T)

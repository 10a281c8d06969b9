"""DiffEEG denoiser — class- and spectrogram-conditioned noise predictor
(reference root/src/models/diffEEG.py:9-145, after arXiv:2306.08256).

Topology kept 1:1 (sinusoidal step embedding + 3-layer MLP, class
embedding, ConvTranspose spectrogram upsampler + GTU gate, 1×1 input
projection, four dilated residual conv blocks, skip-sum + GroupNorm, final
projection), re-expressed on (B, T, C) channel-last tensors.  The
reference wraps each residual block in ``torch.utils.checkpoint``
(diffEEG.py:126-129) to trade FLOPs for memory; the JAX counterpart is
``jax.checkpoint`` (remat) applied in the training step, not baked into
the module.

Same-class spectrogram mixup at train time (``recombine_spectrograms``,
diffEEG.py:136-145) is a pure function here, driven by an explicit PRNG
key from the trainer.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import config as C


def _probe_axis_maps(n_in: int, kernel: int, stride: int,
                     pad: tuple) -> list:
    """For one conv-transpose axis: per-kernel-tap arrays mapping each
    output position to its contributing input position (−1 = none),
    derived by probing the REAL lax op with a delta kernel on a
    position-coded ramp (concrete arrays, so this executes eagerly even
    under an enclosing trace).  Probing instead of re-deriving
    lax.conv_transpose's padding arithmetic keeps this exact by
    construction."""
    maps = []
    # explicit f32 so jax_enable_x64 contexts don't break dtype matching;
    # ramp values are integers ≤ n_in, exact in f32
    x = jnp.arange(1.0, n_in + 1.0, dtype=jnp.float32)[None, None, :, None]
    for kk in range(kernel):
        k = np.zeros((1, kernel, 1, 1), np.float32)
        k[0, kk, 0, 0] = 1.0
        out = jax.lax.conv_transpose(x, jnp.asarray(k), (1, stride),
                                     ((0, 0), tuple(pad)),
                                     dimension_numbers=("NHWC", "HWIO",
                                                        "NHWC"))
        o = np.rint(np.asarray(out))[0, 0, :, 0].astype(np.int64)
        maps.append(o - 1)                        # value v>0 ↔ index v−1
    return maps


@functools.lru_cache(maxsize=16)
def _gather_plan(f_in: int, ts_in: int, T: int,
                 kernel: tuple, strides: tuple, padding: tuple):
    """Static plan for evaluating the conditioning upsampler ONLY at the
    2·T flat positions the linear interpolation reads (lo and hi taps),
    instead of materializing the full (F_out, stride·Ts) plane (~2 GB at
    the reference shape, ~88% of it never sampled).

    Geometry (kernel/strides/padding) comes from the live ConvTranspose
    module, so a config change cannot silently desynchronize the probe.
    Returns per-tap (kh, kw) gather indices into the (F_in, Ts_in) input
    plane plus validity masks, and the lerp weights — pinned by
    tests/test_diffusion.py::test_gathered_conditioning_exact."""
    fmap = _probe_axis_maps(f_in, kernel[0], strides[0], padding[0])
    tmap = _probe_axis_maps(ts_in, kernel[1], strides[1], padding[1])
    f_out, ts_out = len(fmap[0]), len(tmap[0])
    L = f_out * ts_out
    pos = np.clip((np.arange(T) + 0.5) * (L / T) - 0.5, 0.0, L - 1.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, L - 1)
    w = (pos - lo).astype(np.float32)
    flat = np.concatenate([lo, hi])               # (2T,)
    f_s, t_s = flat // ts_out, flat % ts_out
    kh_n, kw_n = kernel
    idx_f = np.zeros((kh_n, 2 * T), np.int64)
    idx_t = np.zeros((kw_n, 2 * T), np.int64)
    ok_f = np.zeros((kh_n, 2 * T), np.float32)
    ok_t = np.zeros((kw_n, 2 * T), np.float32)
    for k in range(kh_n):
        fi = np.asarray(fmap[k])[f_s]
        ok_f[k] = fi >= 0
        idx_f[k] = np.maximum(fi, 0)
    for k in range(kw_n):
        ti = np.asarray(tmap[k])[t_s]
        ok_t[k] = ti >= 0
        idx_t[k] = np.maximum(ti, 0)
    return idx_f, idx_t, ok_f, ok_t, w


def linear_interpolate_time(s: jnp.ndarray, T: int) -> jnp.ndarray:
    """torch ``F.interpolate(mode='linear', align_corners=False)`` on the
    middle axis of (B, L, C): plain 2-tap lerp at the half-pixel grid.

    NOT ``jax.image.resize`` — that applies an anti-aliasing kernel when
    downsampling whose support grows with the ratio; at the reference's
    conditioning shape (L = F·8·T_s = 528,000 → T = 2,000) resize
    materializes a ~4 GB dense weight matrix, where torch (and this)
    touch 2 samples per output point.
    """
    L = s.shape[1]
    pos = jnp.clip((jnp.arange(T) + 0.5) * (L / T) - 0.5, 0.0, L - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, L - 1)
    w = (pos - lo)[None, :, None].astype(s.dtype)
    return s[:, lo, :] * (1.0 - w) + s[:, hi, :] * w


def sinusoidal_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """(B,) or (B,1) diffusion steps → (B, dim) sin/cos embedding
    (diffEEG.py:90-94)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half) * (-np.log(10000.0) / (half - 1)))
    ang = t.reshape(-1, 1) * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class GTU(nn.Module):
    """Gated Tanh Unit (diffEEG.py:9-18): tanh(conv1) ⊙ sigmoid(conv2)."""
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # (B, T, C)
        c = x.shape[-1]
        return (jnp.tanh(nn.Conv(c, (1,), dtype=self.dtype,
                                 name="conv1")(x))
                * nn.sigmoid(nn.Conv(c, (1,), dtype=self.dtype,
                                     name="conv2")(x)))


class ResidualBlock(nn.Module):
    """conv1×1 → ReLU → dilated conv3 → conv1×1 → GroupNorm(1) → Dropout
    (diffEEG.py:82-90).  ``dtype`` sets the conv compute dtype (bf16 AMP);
    the GroupNorm stays in the promoted f32, the usual mixed-precision
    discipline."""
    channels: int
    dilation: int
    dropout: float
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.channels, (1,), dtype=self.dtype,
                    name="conv_in")(x)
        x = nn.relu(x)
        x = nn.Conv(self.channels, (3,), kernel_dilation=(self.dilation,),
                    padding="SAME", dtype=self.dtype, name="conv_dil")(x)
        x = nn.Conv(self.channels, (1,), dtype=self.dtype,
                    name="conv_out")(x)
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class DiffEEG(nn.Module):
    """Noise predictor ε̂(x_t, class, t, spectrogram).

    Args at call:
        x:    (B, n_channels, T) noisy EEG (reference layout).
        y:    (B, n_classes) one-hot class labels.
        t:    (B,) float diffusion steps.
        spec: (B, n_channels, F, T_s) STFT conditioning spectrograms.
    Returns (B, n_channels, T) predicted noise.
    """
    n_classes: int = 6
    n_channels: int = 19
    hidden: int = 32
    dropout: float = 0.1
    #: compute dtype for the dense/conv layers (params stay f32).
    #: ``jnp.bfloat16`` is the TPU analogue of the reference's AMP
    #: autocast training (DiffEEG_train.py:147-154); norms run in the
    #: promoted f32.  None (default) = all-f32, the exactness-pinned mode.
    dtype: object = None

    def setup(self):
        H, dt = self.hidden, self.dtype
        self.step_mlp_0 = nn.Dense(H, dtype=dt, name="step_mlp_0")
        self.step_mlp_2 = nn.Dense(H, dtype=dt, name="step_mlp_2")
        self.step_mlp_4 = nn.Dense(H, dtype=dt, name="step_mlp_4")
        self.class_embedding = nn.Embed(self.n_classes, H, dtype=dt,
                                        name="class_embedding")
        # flax padding ((1,1),(0,0)) + a spatially-flipped kernel is the
        # EXACT equivalent of the reference's torch ConvTranspose2d(
        # stride=(1,8), padding=(1,2)) (diffEEG.py:47-53) — verified
        # value-for-value in tests; the previous ((1,1),(2,2)) produced a
        # flattened length of 8·Ts−5 where torch yields 8·Ts−9
        self.spectrogram_upsample1 = nn.ConvTranspose(
            H // 2, (3, 3), strides=(1, 8), padding=((1, 1), (0, 0)),
            dtype=dt, name="spectrogram_upsample1")
        self.channel_expand = nn.Conv(H, (1,), dtype=dt,
                                      name="channel_expand")
        self.spectrogram_project = nn.Conv(H, (1,), dtype=dt,
                                           name="spectrogram_project")
        self.gtu = GTU(dtype=dt, name="gtu")
        self.input_conv = nn.Conv(H, (1,), dtype=dt, name="input_conv")
        self.res_block1 = ResidualBlock(H, 1, self.dropout, dtype=dt,
                                        name="res_block1")
        self.res_block2 = ResidualBlock(H, 2, self.dropout, dtype=dt,
                                        name="res_block2")
        self.res_block3 = ResidualBlock(H, 4, self.dropout, dtype=dt,
                                        name="res_block3")
        self.res_block4 = ResidualBlock(H, 8, self.dropout, dtype=dt,
                                        name="res_block4")
        self.skip_sum = nn.Conv(H, (1,), dtype=dt, name="skip_sum")
        self.layer_norm = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                                       name="layer_norm")
        self.final_0 = nn.Conv(H, (1,), dtype=dt, name="final_0")
        self.final_norm = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                                       name="final_norm")
        self.final_out = nn.Conv(self.n_channels, (1,), name="final_out")

    def conditioning(self, y: jnp.ndarray, spec: jnp.ndarray,
                     T: int) -> jnp.ndarray:
        """Class + spectrogram conditioning, (B, T, H).

        Depends only on (y, spec) — constant across all diffusion steps of
        one generation, so the sampler precomputes it ONCE and reuses it
        for the 1000-step reverse scan (the reference recomputes the whole
        branch in every one of the 1000 forwards, hot loop #4).

        The upsampler is evaluated ONLY at the 2·T flattened positions
        the linear interpolation reads (9 static gathers + one small
        contraction) instead of materializing the full (F, 8·Ts) plane —
        ~2 GB at the reference shape, ~88% of it never sampled, and its
        gradient was the dominant cost of every training micro-batch.
        Algebraically identical to the dense chain (the two linear 1×1
        convs commute with the lerp; relu is applied pointwise at the
        gathered positions exactly as the dense path applies it before
        flattening); exactness pinned against :meth:`conditioning_dense`.
        """
        labels = jnp.argmax(y, axis=-1)
        class_emb = self.class_embedding(labels)[:, None, :]   # (B, 1, H)

        s = jnp.transpose(spec, (0, 2, 3, 1))            # (B, F, Ts, C)
        if self.dtype is not None:
            # the manual gather-matmul path below runs in the module's
            # compute dtype, like the flax layers do for the dense chain
            s = s.astype(self.dtype)
        B, F, Ts, Ci = s.shape
        up = self.spectrogram_upsample1
        idx_f, idx_t, ok_f, ok_t, w = _gather_plan(
            F, Ts, T, tuple(up.kernel_size), tuple(up.strides),
            tuple(tuple(p) for p in up.padding))
        if self.is_initializing():
            _ = up(jnp.zeros((1, 4, 8, Ci), s.dtype))
        kern = up.variables["params"]["kernel"]
        bias = up.variables["params"]["bias"]
        out = jnp.zeros((B, idx_f.shape[1], kern.shape[-1]), s.dtype)
        for kh in range(idx_f.shape[0]):
            for kw in range(idx_t.shape[0]):
                mask = ok_f[kh] * ok_t[kw]
                if not mask.any():
                    continue
                xg = s[:, idx_f[kh], idx_t[kw], :]       # (B, 2T, Ci)
                xg = xg * jnp.asarray(mask, s.dtype)[None, :, None]
                out = out + xg @ kern[kh, kw].astype(s.dtype)
        out = nn.relu(out + bias.astype(s.dtype))        # (B, 2T, H/2)
        lo, hi = out[:, :T, :], out[:, T:, :]
        wj = jnp.asarray(w)[None, :, None].astype(out.dtype)
        si = lo * (1.0 - wj) + hi * wj                   # (B, T, H/2)
        si = self.channel_expand(si)
        si = self.spectrogram_project(si)
        si = self.gtu(si)                                # (B, T, H)
        return si + class_emb

    def conditioning_dense(self, y: jnp.ndarray, spec: jnp.ndarray,
                           T: int) -> jnp.ndarray:
        """Reference-literal dense chain (diffEEG.py:47-57, 108-117):
        full ConvTranspose plane → relu → flatten → 2-tap lerp → 1×1
        convs → GTU.  Kept as the golden for the gathered path."""
        labels = jnp.argmax(y, axis=-1)
        class_emb = self.class_embedding(labels)[:, None, :]   # (B, 1, H)

        s = jnp.transpose(spec, (0, 2, 3, 1))
        s = nn.relu(self.spectrogram_upsample1(s))       # (B, F, Ts', H/2)
        b, f, ts, c = s.shape
        # torch .flatten(start_dim=2) flattens (F, Ts') channel-major;
        # equivalent sequence axis here with channel-last layout:
        s = s.reshape(b, f * ts, c)                      # (B, L, H/2)
        # F.interpolate(mode='linear', align_corners=False) onto T points.
        s = linear_interpolate_time(s, T)
        s = self.channel_expand(s)
        s = self.spectrogram_project(s)
        s = self.gtu(s)                                  # (B, T, H)
        return s + class_emb

    def denoise(self, x: jnp.ndarray, cond: jnp.ndarray, t: jnp.ndarray,
                train: bool = False) -> jnp.ndarray:
        """ε̂ from a precomputed conditioning tensor — the per-step work."""
        H = self.hidden
        # === Step embedding ===  (diffEEG.py:35-41, 100-102)
        se = sinusoidal_embedding(t.astype(jnp.float32), H)
        se = self.step_mlp_0(se)
        se = nn.sigmoid(se)
        se = self.step_mlp_2(se)
        se = nn.relu(se)
        se = self.step_mlp_4(se)
        step_emb = se[:, None, :]                        # (B, 1, H)

        # === Input projection ===  (diffEEG.py:60, 120)
        xt = jnp.swapaxes(x, -1, -2)                     # (B, T, C)
        eeg_proj = self.input_conv(xt)

        # === Combine ===  (diffEEG.py:122-123)
        h = eeg_proj + step_emb + cond

        # === Residual stack ===  (diffEEG.py:62-67, 125-129)
        h1 = self.res_block1(h, train)
        h2 = self.res_block2(h1, train)
        h3 = self.res_block3(h2, train)
        h4 = self.res_block4(h3, train)

        h = self.skip_sum(h1 + h2 + h3 + h4)
        h = self.layer_norm(h)

        # === Final projection ===  (diffEEG.py:70-76, 134)
        h = self.final_0(h)
        h = nn.relu(h)
        h = self.final_norm(h)
        h = self.final_out(h)
        return jnp.swapaxes(h, -1, -2)                   # (B, C, T)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, t: jnp.ndarray,
                 spec: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        T = x.shape[-1]
        return self.denoise(x, self.conditioning(y, spec, T), t, train)


def make_cached_denoiser(model: DiffEEG, variables, y: jnp.ndarray,
                         spec: jnp.ndarray, length: int):
    """Denoiser for the reverse-diffusion scan with the (y, spec)
    conditioning precomputed ONCE — drop-in for the samplers'
    ``denoise_fn(x, y, t, spec)`` contract (the y/spec arguments at call
    time are ignored; they are already baked into the cached tensor)."""
    cond = model.apply(variables, y, spec, length,
                       method=DiffEEG.conditioning)

    def denoise_fn(x, _y, t, _spec):
        return model.apply(variables, x, cond, t, method=DiffEEG.denoise)

    return denoise_fn


def recombine_spectrograms(key: jax.Array, spectrograms: jnp.ndarray,
                           labels: jnp.ndarray, n_classes: int = 6,
                           alpha: float = 0.5) -> jnp.ndarray:
    """Same-class spectrogram mixup (diffEEG.py:136-145), vectorized.

    For each sample, mixes its spectrogram with one drawn from the same
    class: ``α·spec[i] + (1−α)·spec[perm(i)]`` where ``perm`` permutes
    within each class.  Implemented with a masked Gumbel-top-k trick so the
    whole thing stays jittable with static shapes.
    """
    B = spectrograms.shape[0]
    # Random scores; per class, sort member indices by score → a random
    # permutation *within* each class, identity across classes.
    scores = jax.random.uniform(key, (B,))
    # Order samples by (label, score): members of a class get shuffled.
    order = jnp.lexsort((scores, labels))
    # For each consecutive run of equal labels in `order`, roll by one to
    # derive a same-class partner (single-member classes map to themselves).
    lab_sorted = labels[order]
    left = jnp.roll(order, 1)
    left_ok = jnp.roll(lab_sorted, 1) == lab_sorted
    partner_sorted = jnp.where(left_ok, left, order)
    partner = jnp.zeros_like(partner_sorted).at[order].set(partner_sorted)
    mixed = alpha * spectrograms + (1 - alpha) * spectrograms[partner]
    return mixed


class DiffEEGSanityCheck(nn.Module):
    """MLP autoencoder used by the reference for MNIST sanity training
    (diffEEG.py:151-212) — retained as a smoke-test model."""
    input_dim: int = 784
    hidden: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b = x.shape[0]
        h = x.reshape(b, -1)
        h = nn.relu(nn.Dense(self.hidden, name="enc1")(h))
        h = nn.relu(nn.Dense(self.hidden // 2, name="enc2")(h))
        h = nn.relu(nn.Dense(self.hidden, name="dec1")(h))
        out = nn.Dense(self.input_dim, name="dec2")(h)
        return out.reshape(x.shape)

"""Model-zoo forward-shape + gradient-finiteness tests (SURVEY.md §4
layer 2).  Small input sizes keep CPU runtime sane; full-size shapes are
covered by the benchmark and graft entry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_brain_pattern_identification_xai_tpu import models

EEG_SHAPE = (2, 1, 37, 384)      # scaled-down Samples (multiple of 64)
SPEC_SHAPE = (2, 3, 64, 48)

EEG_MODELS = [
    ("eegnet", {"samples": 384}),
    ("eegnet_attention_deep", {"samples": 384}),
    ("eegnet_attention_regularized", {"samples": 384}),
    ("eegnet_residual", {"samples": 384}),
    ("eegnet_residual_lstm", {"samples": 384}),
    ("eegnet_transformer", {"samples": 384}),
    ("eeg_seizure_detection", {"samples": 384}),
    # DeepConvNet's four VALID (1,10)+pool4 stages need ≥~1024 samples
    ("deepconvnet", {"samples": 3000}),
]

SPEC_MODELS = [
    ("spectrogram_cnn", {}),
    ("efficientnet_b0", {}),
    ("efficientnetv2_b2", {}),
    ("spectrogram_vit", {"image_size": (64, 48), "dim": 64, "depth": 2,
                         "n_heads": 4, "mlp_dim": 128}),
]


def _init_and_run(model, *args):
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, *args)
    out = model.apply(variables, *args)
    return variables, out


@pytest.mark.parametrize("name,kw", EEG_MODELS)
def test_eeg_model_forward(name, kw, rng):
    model = models.build(name, **kw)
    shape = EEG_SHAPE[:3] + (kw["samples"],)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    variables, out = _init_and_run(model, x)
    assert out.shape == (2, 6)
    if name != "deepconvnet":  # all but wavenet/deepconv emit log-probs
        pass
    # log-softmax outputs sum to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-4)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("name,kw", SPEC_MODELS)
def test_spec_model_forward(name, kw, rng):
    model = models.build(name, **kw)
    x = jnp.asarray(rng.standard_normal(SPEC_SHAPE), jnp.float32)
    variables, out = _init_and_run(model, x)
    assert out.shape == (2, 6)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-4)


def test_wavenet_forward_and_sharing(rng):
    model = models.build("wavenet", block_layers=(3, 2), block_dims=(8, 8))
    x = jnp.asarray(rng.standard_normal((2, 256, 8)), jnp.float32)
    variables, out = _init_and_run(model, x)
    assert out.shape == (2, 6)           # raw logits, no softmax
    # weight sharing: the wave blocks appear once (folded channels→batch)
    names = list(variables["params"].keys())
    assert sum(n.startswith("wave_block") for n in names) == 2
    # dict input API parity
    out2 = model.apply(variables, {"x": x})
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_multimodal_model(rng):
    eeg = models.EEGNet(samples=384)
    spec = models.SpectrogramCNN()
    mm = models.MultimodalModel(eeg_model=eeg, spectrogram_model=spec)
    xe = jnp.asarray(rng.standard_normal(EEG_SHAPE), jnp.float32)
    xs = jnp.asarray(rng.standard_normal(SPEC_SHAPE), jnp.float32)
    variables = mm.init(jax.random.PRNGKey(0), xe, xs)
    out = mm.apply(variables, xe, xs)
    assert out.shape == (2, 6)
    spec_only = mm.apply(variables, xs, method=mm.forward_spectrogram)
    assert spec_only.shape == (2, 6)
    eeg_only = mm.apply(variables, xe, method=mm.forward_eeg)
    assert eeg_only.shape == (2, 6)


@pytest.mark.slow
def test_gradients_finite(rng):
    """Gradient-finiteness through a representative model."""
    model = models.EEGNet(samples=384)
    x = jnp.asarray(rng.standard_normal(EEG_SHAPE), jnp.float32)
    y = jax.nn.one_hot(jnp.array([1, 4]), 6)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params):
        logp = model.apply({**variables, "params": params}, x)
        return -jnp.mean(jnp.sum(y * logp, axis=-1))

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.any(np.asarray(g) != 0) for g in flat)


def test_diffeeg_denoiser_forward(rng):
    model = models.DiffEEG(n_channels=4, hidden=8)
    x = jnp.asarray(rng.standard_normal((2, 4, 128)), jnp.float32)
    y = jax.nn.one_hot(jnp.array([0, 3]), 6)
    t = jnp.array([10.0, 500.0])
    spec = jnp.asarray(rng.standard_normal((2, 4, 9, 16)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, y, t, spec)
    out = model.apply(variables, x, y, t, spec)
    assert out.shape == (2, 4, 128)
    assert np.all(np.isfinite(np.asarray(out)))


def test_recombine_spectrograms_same_class_mixup(rng):
    specs = jnp.asarray(rng.standard_normal((6, 2, 3, 4)), jnp.float32)
    labels = jnp.array([0, 0, 1, 1, 1, 2])
    mixed = models.recombine_spectrograms(jax.random.PRNGKey(0), specs, labels)
    m = np.asarray(mixed)
    s = np.asarray(specs)
    # class 2 has a single member → unchanged
    np.testing.assert_allclose(m[5], s[5], rtol=1e-6)
    # every mixed sample must be an average of two same-class members
    for i, lab in enumerate([0, 0, 1, 1, 1]):
        members = [j for j in range(6) if int(labels[j]) == lab]
        ok = any(np.allclose(m[i], 0.5 * s[i] + 0.5 * s[j], atol=1e-5)
                 for j in members)
        assert ok, i


def test_batchnorm_updates_running_stats(rng):
    model = models.EEGNet(samples=384)
    x = jnp.asarray(rng.standard_normal(EEG_SHAPE), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mutated = model.apply(
        variables, x, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(after, before))


def test_eegnet_fused_inference_exact(rng):
    """The stem's inference-time operator reassociation (channel
    contraction before the temporal conv, BN folded through) must be
    bitwise-near the canonical order."""
    from multimodal_brain_pattern_identification_xai_tpu.models.eegnet import (
        _EEGNetStem)
    import flax.linen as nn
    x = jnp.asarray(rng.standard_normal((2, 37, 384, 1)), jnp.float32)
    stem_f = _EEGNetStem(37, 16, 8, 2, 16, 0.5, fused_inference=True)
    stem_c = _EEGNetStem(37, 16, 8, 2, 16, 0.5, fused_inference=False)
    v = stem_f.init(jax.random.PRNGKey(0), x, True)
    # move BN stats off their init values
    (_, _), mut = stem_f.apply(v, x, True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1)})
    v = {**v, **mut}
    yf, sf = stem_f.apply(v, x)
    yc, sc = stem_c.apply(v, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yc),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sf), np.asarray(sc),
                               rtol=1e-5, atol=1e-5)


def test_spectrogram_cnn_bf16_mode_close_to_f32(rng):
    """bf16 serving mode: probabilities stay within 2e-2 of f32."""
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 48)), jnp.float32)
    m32 = models.SpectrogramCNN()
    v = m32.init(jax.random.PRNGKey(0), x)
    m16 = models.SpectrogramCNN(dtype=jnp.bfloat16)
    p32 = np.exp(np.asarray(m32.apply(v, x)))
    p16 = np.exp(np.asarray(m16.apply(v, x)))
    assert p16.dtype == np.float32
    np.testing.assert_allclose(p16, p32, atol=2e-2)


def test_efficientnetv2_b2_topology():
    """Pin the V2-B2 scaling (width 1.1 / depth 1.2 over the V2 base):
    stage widths 16/32/56/104/120/208, repeats 2/3/3/4/6/10, head 1408 —
    the timm/keras efficientnetv2_b2 shape — and the fused/mb block split
    (fused convs in the first three high-resolution stages)."""
    import jax
    model = models.build("efficientnetv2_b2")
    x = jnp.zeros((1, 3, 64, 48), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    assert params["head_conv"]["kernel"].shape[-1] == 1408
    from multimodal_brain_pattern_identification_xai_tpu.models import (
        efficientnet)
    for si, (blk, e, c, r, s, k) in enumerate(efficientnet.V2_B2_STAGES):
        blocks = [n for n in params if n.startswith(f"stage{si}_block")]
        assert len(blocks) == r, (si, blocks)
        first = params[f"stage{si}_block0"]
        if blk == "fused":
            assert "fused_conv" in first and "depthwise_conv" not in first
        else:
            assert "depthwise_conv" in first and "se" in first
    n_params = sum(np.prod(l.shape) for l in
                   jax.tree_util.tree_leaves(params))
    # timm efficientnetv2_b2 is 10.10M with a 1000-class head
    # (1408*1000+1000 = 1.409M); a 6-class head leaves ~8.70M ± rounding
    assert 8.4e6 < n_params < 9.1e6, n_params


def test_speccnn_reduced_resolution_serving_preset(rng):
    """The r5 opt-in TPU-serving preset for the dual-branch pipeline
    (bench ``BENCH_SPEC_RES`` / ``--set signal.image_size=[200,150]
    --set signal.resize_mode=resample``): the SpectrogramCNN is fully
    convolutional + GAP, so the SAME weights serve an anti-alias-resampled
    200×150 plane — block1/2 (the measured MXU-utilization ceiling of
    BASELINE config #3, PARITY.md 'spec-CNN ceiling') cost 4× less.

    What this test pins — the MECHANISM, not an accuracy-parity claim:

    * the identical parameter tree serves both resolutions (deterministic,
      finite, correct shapes, and the GAP head keeps class count);
    * for smooth energy distributions (what real HMS planes look like
      after the chain's Gaussian smooth), full- and half-res class
      probabilities agree closely.

    An accuracy-parity claim is deliberately NOT manufactured here: the
    r5 characterization (PARITY.md 'reduced-resolution serving preset')
    measured that resolution transfer is DATA-DEPENDENT — smooth-energy
    class signals transfer, fine-texture (stripe-period) signals
    anti-transfer because downscaling halves their period.  Validating
    the preset for production requires the real checkpoint + data; the
    exact-parity 400×300 path stays the default."""
    import multimodal_brain_pattern_identification_xai_tpu.config as C
    from multimodal_brain_pattern_identification_xai_tpu import ops

    # smooth low-spatial-frequency energy planes, temporally modulated so
    # the chain's baseline correction (per-row time-mean subtract) does
    # not erase them
    n = 4
    t_ax = np.arange(300, dtype=np.float32)
    raw = np.zeros((n, 400, 300), np.float32)
    for i in range(n):
        g = rng.random((10, 8)).astype(np.float32)
        plane = np.asarray(jax.image.resize(jnp.asarray(g), (400, 300),
                                            "bilinear"))
        P = 60 + 60 * rng.random()
        env = 0.5 + 0.5 * np.sin(2 * np.pi * t_ax / P + rng.random() * 6.28)
        raw[i] = plane * env[None, :] * 8.0
    raw += rng.standard_normal(raw.shape).astype(np.float32) * 0.05

    x_full = ops.hms_spectrogram_preprocess(jnp.asarray(raw))
    sig = C.SignalConfig(image_size=(200, 150), resize_mode="resample")
    x_half = ops.hms_spectrogram_preprocess(jnp.asarray(raw), signal=sig)
    assert x_full.shape == (n, 3, 400, 300)
    assert x_half.shape == (n, 3, 200, 150)

    model = models.SpectrogramCNN()
    v = model.init(jax.random.PRNGKey(0), x_full[:2])
    variables = {"params": v["params"], "batch_stats": v["batch_stats"]}
    p_full = np.asarray(model.apply(variables, x_full))
    p_half = np.asarray(model.apply(variables, x_half))
    assert p_full.shape == p_half.shape == (n, 6)
    assert np.isfinite(p_half).all()
    # determinism: same weights, same input → bitwise-same serving output
    p_half2 = np.asarray(model.apply(variables, x_half))
    np.testing.assert_array_equal(p_half, p_half2)
    # smooth-input probability agreement (mean per-sample KL in nats)
    kl = float(np.mean(np.sum(np.exp(p_full) * (p_full - p_half), -1)))
    assert kl < 0.02, kl


def test_bilinear_interpolate_matches_torch(rng):
    """models.layers.bilinear_interpolate_nhwc is torch F.interpolate
    (bilinear, align_corners=False, antialias=False) — both the gather
    lerp (odd ratios) and the reshape-mean exact-half fast path."""
    torch = __import__("torch")
    from multimodal_brain_pattern_identification_xai_tpu.models.layers import (
        bilinear_interpolate_nhwc)
    for (h, w), (h2, w2) in (((8, 12), (4, 6)),      # exact halves
                             ((25, 37), (12, 18)),   # odd downscales
                             ((9, 7), (18, 21))):    # upscales
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        got = np.asarray(bilinear_interpolate_nhwc(jnp.asarray(x), (h2, w2)))
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(h2, w2),
            mode="bilinear", align_corners=False
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

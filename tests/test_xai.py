"""XAI stack tests: IG completeness axiom, Grad-CAM nonnegativity + cost,
expected-gradients sanity, LIME recovery of a planted signal, rollout
normalization, channel selection (SURVEY.md §4 layer 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_brain_pattern_identification_xai_tpu import models, xai


@pytest.fixture(scope="module")
def small_cnn():
    model = models.SpectrogramCNN()
    x = jnp.zeros((2, 3, 64, 48))
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    fwd = jax.jit(lambda xx: model.apply(variables, xx))
    return model, variables, fwd


def test_saliency_shapes_and_nonneg(small_cnn, rng):
    _, _, fwd = small_cnn
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 48)), jnp.float32)
    s = xai.saliency_maps(fwd, x)
    assert s.shape == x.shape
    assert np.all(np.asarray(s) >= 0)


@pytest.mark.slow
def test_multimodal_saliency(rng):
    eeg_m = models.EEGNet(samples=128, kern_length=8)
    spec_m = models.SpectrogramCNN()
    mm = models.MultimodalModel(eeg_model=eeg_m, spectrogram_model=spec_m)
    xe = jnp.asarray(rng.standard_normal((2, 1, 37, 128)), jnp.float32)
    xs = jnp.asarray(rng.standard_normal((2, 3, 64, 48)), jnp.float32)
    variables = mm.init(jax.random.PRNGKey(0), xe, xs)
    fwd = lambda e, s: mm.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, e, s)
    ge, gs = xai.multimodal_saliency(fwd, xe, xs)
    assert ge.shape == xe.shape and gs.shape == xs.shape


@pytest.mark.slow
def test_integrated_gradients_completeness(small_cnn, rng):
    """IG completeness: sum(attr) ≈ f(x) − f(baseline)."""
    _, _, fwd = small_cnn
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 48)), jnp.float32)
    baseline = jnp.zeros_like(x)
    target = jnp.argmax(fwd(x), -1)
    attr = xai.integrated_gradients(fwd, x, baseline, target, steps=256)
    fx = jnp.take_along_axis(fwd(x), target[:, None], -1)[:, 0]
    f0 = jnp.take_along_axis(fwd(baseline), target[:, None], -1)[:, 0]
    total = np.asarray(attr.reshape(2, -1).sum(-1))
    np.testing.assert_allclose(total, np.asarray(fx - f0), rtol=0.05,
                               atol=5e-3)


def test_expected_gradients_shapes(small_cnn, rng):
    _, _, fwd = small_cnn
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 48)), jnp.float32)
    bg = jnp.asarray(rng.standard_normal((16, 3, 64, 48)), jnp.float32)
    vals = xai.gradient_shap_values(fwd, x, bg, jax.random.PRNGKey(0),
                                    n_classes=6, nsamples=8)
    assert vals.shape == (6, 2, 3, 64, 48)
    assert np.all(np.isfinite(np.asarray(vals)))


def test_chunked_attribution_sweeps_match_vmapped(small_cnn, rng):
    """``chunk=`` (the HBM-control scan form used by bench --xai-batch for
    production-size sweeps) must reproduce the one-shot vmapped result —
    same math, different f32 summation order."""
    _, _, fwd = small_cnn
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 48)), jnp.float32)
    tgt = jnp.argmax(fwd(x), -1)
    ig_full = xai.integrated_gradients(fwd, x, None, tgt, steps=8)
    ig_chunk = xai.integrated_gradients(fwd, x, None, tgt, steps=8, chunk=2)
    np.testing.assert_allclose(np.asarray(ig_chunk), np.asarray(ig_full),
                               rtol=1e-4, atol=1e-6)

    bg = jnp.asarray(rng.standard_normal((16, 3, 64, 48)), jnp.float32)
    key = jax.random.PRNGKey(0)
    eg_full = xai.expected_gradients(fwd, x, bg, key, tgt, nsamples=8)
    eg_chunk = xai.expected_gradients(fwd, x, bg, key, tgt, nsamples=8,
                                      chunk=4)
    np.testing.assert_allclose(np.asarray(eg_chunk), np.asarray(eg_full),
                               rtol=1e-4, atol=1e-6)

    with pytest.raises(ValueError):
        xai.integrated_gradients(fwd, x, None, tgt, steps=8, chunk=3)


def test_grad_cam(small_cnn, rng):
    model, variables, _ = small_cnn
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 48)), jnp.float32)
    cam = xai.grad_cam(model, variables, x, upsample_to=(64, 48))
    cam = np.asarray(cam)
    assert cam.shape == (2, 64, 48)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


def test_grad_cam_on_eegnet(rng):
    model = models.EEGNet(samples=128, kern_length=8)
    x = jnp.asarray(rng.standard_normal((2, 1, 37, 128)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    variables = {"params": v["params"], "batch_stats": v["batch_stats"]}
    cam = xai.grad_cam(model, variables, x)
    assert cam.shape[0] == 2 and np.all(np.asarray(cam) >= 0)


def test_slic_segments_cover_image(rng):
    img = rng.random((80, 60))
    seg = xai.slic_segments(img, n_segments=25)
    assert seg.shape == (80, 60)
    assert seg.min() == 0
    assert 10 <= seg.max() + 1 <= 40
    # contiguous-ish: every label non-empty
    assert all((seg == k).sum() > 0 for k in range(seg.max() + 1))


def test_lime_recovers_planted_region(rng):
    """A predictor keyed on one image region → LIME ranks that region top."""
    def predict(batch):                   # batch (N, H, W, C)
        score = batch[:, 8:24, 8:24, 0].mean(axis=(1, 2))
        p1 = 1 / (1 + np.exp(-10 * (score - 0.5)))
        return np.stack([1 - p1, p1], axis=1)

    img = np.zeros((32, 32, 1), np.float32)
    img[8:24, 8:24] = 1.0
    res = xai.lime_explain(predict, img, n_segments=16, num_samples=500,
                           hide_color=0.0, seed=1)
    assert res["label"] == 1
    inside = res["heatmap"][8:24, 8:24].mean()
    outside = (res["heatmap"].sum() - res["heatmap"][8:24, 8:24].sum()) / (
        32 * 32 - 16 * 16)
    assert inside > outside
    assert res["mask"][12, 12]


def test_attention_rollout_rows_normalized(rng):
    a1 = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 4, 5, 5))), -1)
    a2 = jax.nn.softmax(jnp.asarray(rng.standard_normal((2, 4, 5, 5))), -1)
    r = xai.attention_rollout([a1, a2])
    np.testing.assert_allclose(np.asarray(r.sum(-1)), 1.0, atol=1e-5)


def test_rollout_from_vit(rng):
    model = models.SpectrogramViT(image_size=(64, 48), dim=32, depth=2,
                                  n_heads=2, mlp_dim=64)
    x = jnp.asarray(rng.standard_normal((1, 3, 64, 48)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    r = xai.rollout.rollout_from_model(model, variables, x)
    assert r.shape[0] == 1 and r.shape[1] == r.shape[2]
    np.testing.assert_allclose(np.asarray(r.sum(-1)), 1.0, atol=1e-5)


def test_channel_selection(rng):
    shap_vals = rng.standard_normal((6, 2, 1, 37, 100))
    shap_vals[..., 5, :] *= 100           # channel 5 dominates
    idx, scores = xai.get_top_n_channels(shap_vals, n=3)
    assert idx[0] == 5
    x = rng.standard_normal((4, 1, 37, 100)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, 4)]
    xs, ys = xai.restructure_to_top_channels(x, y, idx, positive_class=2)
    assert xs.shape == (4, 1, 3, 100)
    assert ys.shape == (4, 2)
    np.testing.assert_allclose(ys.sum(-1), 1.0)
    names = xai.channel_select.channel_names_37()
    assert len(names) == 37 and names[19] == "Fp1-F7"


@pytest.mark.slow
def test_retrain_on_top_channels_improves_over_fresh(rng):
    """Channel-selection retraining (XAI_Multimodality.py:2467-2587): with
    class-0 signal planted on channels 2 and 5 and SHAP mass put there,
    the workflow picks those channels, binarizes labels, and the retrained
    binary classifier beats its fresh init on validation kldiv."""
    n, Cn, T = 24, 8, 128
    y = np.eye(6, dtype=np.float32)[np.arange(n) % 6]
    x = rng.standard_normal((n, 1, Cn, T)).astype(np.float32)
    t = np.linspace(0, 1, T, dtype=np.float32)
    mask = y.argmax(1) == 0
    x[mask, 0, 2] += 3 * np.sin(2 * np.pi * 8 * t)
    x[mask, 0, 5] += 3 * np.sin(2 * np.pi * 8 * t)
    sv = np.zeros((6, 2, 1, Cn, T), np.float32)
    sv[0, ..., 2, :] = 1.0
    sv[0, ..., 5, :] = 1.0
    rep = xai.retrain_on_top_channels(
        x, y, sv, n_channels=2, positive_class=0, epochs=5, batch_size=8,
        seed=0, model_kwargs=dict(samples=T, kern_length=8))
    assert sorted(rep["top_channels"]) == [2, 5]
    assert rep["retrained"]["kldiv"] < rep["fresh"]["kldiv"]


@pytest.fixture(scope="module")
def imported_eegnet():
    """Torch EEGNet (fabricated reference weights) + the same network
    imported into JAX — the attribution-fidelity ground truth pair."""
    from torch_ref import make_torch_eegnet
    f1, d, samples = 8, 2, 480
    sd, torch_forward = make_torch_eegnet(seed=0, f1=f1, d=d,
                                          samples=samples)
    model = models.EEGNet(samples=samples)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 1, 37, samples)))
    v2 = models.load_torch_eegnet_state_dict(sd, variables, f1=f1, d=d)
    fwd = jax.jit(lambda xx: model.apply(
        {"params": v2["params"], "batch_stats": v2["batch_stats"]}, xx))
    return torch_forward, fwd, samples


def test_saliency_matches_torch_autograd(imported_eegnet, rng):
    """North-star attribution fidelity: |∂ max-logit/∂x| on an imported
    checkpoint matches torch autograd ground truth to fp32 tolerance
    (reference generate_saliency_maps, XAI_Multimodality.py:3056-3153)."""
    torch = __import__("torch")
    torch_forward, fwd, samples = imported_eegnet
    x = rng.standard_normal((3, 1, 37, samples)).astype(np.float32)

    got = np.asarray(xai.saliency_maps(fwd, jnp.asarray(x)))

    xt = torch.from_numpy(x).requires_grad_(True)
    out = torch_forward(xt)
    out.max(dim=1).values.sum().backward()
    want = xt.grad.abs().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)
    assert np.abs(want).max() > 0


def test_integrated_gradients_match_torch(imported_eegnet, rng):
    """IG (midpoint Riemann, zeros baseline) on the imported checkpoint
    matches a manual torch-autograd IG with identical quadrature — the
    captum IntegratedGradients intent (XAI_Multimodality.py:51)."""
    torch = __import__("torch")
    torch_forward, fwd, samples = imported_eegnet
    x = rng.standard_normal((2, 1, 37, samples)).astype(np.float32)
    steps = 16

    xt = torch.from_numpy(x)
    with torch.no_grad():
        target = torch_forward(xt).argmax(dim=1)

    got = np.asarray(xai.integrated_gradients(
        fwd, jnp.asarray(x), target=jnp.asarray(target.numpy()),
        steps=steps))

    grads = torch.zeros_like(xt)
    for k in range(steps):
        alpha = (k + 0.5) / steps
        point = (alpha * xt).clone().requires_grad_(True)
        out = torch_forward(point)
        out.gather(1, target[:, None]).sum().backward()
        grads += point.grad
    want = (xt * grads / steps).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)
    # completeness vs torch end-point scores (IG axiom on the same pair)
    with torch.no_grad():
        fx = torch_forward(xt).gather(1, target[:, None])[:, 0].numpy()
        f0 = torch_forward(torch.zeros_like(xt)).gather(
            1, target[:, None])[:, 0].numpy()
    np.testing.assert_allclose(got.reshape(len(x), -1).sum(1), fx - f0,
                               rtol=0.05, atol=0.05)


def test_expected_gradients_match_torch(imported_eegnet, rng):
    """Expected-gradients (the SHAP GradientExplainer estimator,
    XAI_Multimodality.py:2242-2329) on the imported checkpoint matches a
    torch-autograd implementation fed the IDENTICAL Monte-Carlo draws:
    for each draw, (x − b) · ∂f_c(b + α(x − b))/∂x — pinning the
    estimator math and the gradients to fp32 tolerance."""
    torch = __import__("torch")
    torch_forward, fwd, samples = imported_eegnet
    nsamples, n_bg = 32, 6
    x = rng.standard_normal((2, 1, 37, samples)).astype(np.float32)
    bg = rng.standard_normal((n_bg, 1, 37, samples)).astype(np.float32)

    xt = torch.from_numpy(x)
    with torch.no_grad():
        target = torch_forward(xt).argmax(dim=1)

    key = jax.random.PRNGKey(3)
    got = np.asarray(xai.expected_gradients(
        fwd, jnp.asarray(x), jnp.asarray(bg), key,
        jnp.asarray(target.numpy()), nsamples=nsamples))

    # replay the exact draws expected_gradients makes from `key`
    kb, ka = jax.random.split(key)
    bg_idx = np.asarray(jax.random.randint(kb, (nsamples, len(x)), 0, n_bg))
    alphas = np.asarray(jax.random.uniform(ka, (nsamples, len(x))))

    bgt = torch.from_numpy(bg)
    acc = torch.zeros_like(xt)
    for s in range(nsamples):
        b = bgt[torch.from_numpy(bg_idx[s])]
        a = torch.from_numpy(alphas[s]).reshape(-1, 1, 1, 1)
        point = (b + a * (xt - b)).clone().requires_grad_(True)
        out = torch_forward(point)
        out.gather(1, target[:, None]).sum().backward()
        acc += (xt - b) * point.grad
    want = (acc / nsamples).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-6)
    assert np.abs(want).max() > 0


def test_lime_overlay_renders(tmp_path, rng):
    """Boundary overlay rendering (reference mark_boundaries +
    plot_segments cells, XAI_Multimodality.py:2737-2794)."""
    img = rng.random((40, 30, 3)).astype(np.float32)
    seg = xai.slic_segments(img, n_segments=9)
    # mark_boundaries paints edge pixels with the given color
    marked = xai.mark_boundaries(img.mean(-1), seg)
    assert marked.shape == (40, 30, 3)
    edge_px = (marked == np.array([1.0, 1.0, 0.0])).all(-1).sum()
    assert edge_px > 0
    exp = {"segments": seg, "label": 3,
           "weights": rng.standard_normal(seg.max() + 1),
           "heatmap": rng.standard_normal((40, 30)),
           "mask": seg % 2 == 0}
    import os
    p = xai.plot_lime_overlay(img, exp, str(tmp_path))
    assert os.path.getsize(p) > 0

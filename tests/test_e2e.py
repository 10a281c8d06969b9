"""End-to-end smoke tests (SURVEY.md §4 layer 6): raw synthetic signals →
fused preprocessing → training a multimodal model on the dummy
1-per-class dataset → eval + XAI, mirroring the reference's
DummyEEGDataset sanity flow (dataset.py:230-240) and the full notebook
pipeline at miniature scale."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import multimodal_brain_pattern_identification_xai_tpu.config as C
from multimodal_brain_pattern_identification_xai_tpu import (data, models,
                                                             ops, train, xai)


@pytest.mark.slow
def test_full_pipeline_smoke(tmp_path, rng):
    # raw signals like the parquet crops
    n = 12
    raw_eeg = data.synthetic_raw_eeg(n, rng, n_points=2000)
    raw_spec = data.synthetic_raw_spectrogram(n, rng, shape=(80, 60))
    labels = np.arange(n) % 6
    y = np.eye(6, dtype=np.float32)[labels]

    # fused on-device preprocessing (small shapes for CPU CI)
    sig = C.SignalConfig(fixed_length=600, image_size=(80, 60))
    eeg_in, spec_in = ops.preprocess_multimodal(
        jnp.asarray(raw_eeg), jnp.asarray(raw_spec), signal=sig)
    assert eeg_in.shape == (n, 1, 37, 600)
    assert spec_in.shape == (n, 3, 80, 60)
    assert np.isfinite(np.asarray(eeg_in)).all()
    assert np.isfinite(np.asarray(spec_in)).all()

    # multimodal model + trainer for a few epochs
    mm = models.MultimodalModel(
        eeg_model=models.EEGNetAttentionRegularized(samples=600,
                                                    kern_length=16),
        spectrogram_model=models.SpectrogramCNN())
    tx = train.state.make_optimizer(3e-3)
    state = train.create_train_state(
        mm, (eeg_in[:2], spec_in[:2]), tx, jax.random.PRNGKey(0))
    cfg = train.TrainerConfig(epochs=3, eval_metrics=("kldiv", "accuracy"))
    trainer = train.Trainer(state, cfg, ckpt_dir=str(tmp_path / "ckpt"))

    batch = {"eeg": np.asarray(eeg_in), "spec": np.asarray(spec_in), "y": y}
    loader = lambda: iter([batch])
    final_state, best, oof = trainer.train_eval(loader, loader)
    assert np.isfinite(best)
    assert trainer.history["train_loss"][-1] <= trainer.history["train_loss"][0]

    # XAI on the trained model
    variables = {"params": final_state.params,
                 "batch_stats": final_state.batch_stats}
    fwd = lambda e, s: mm.apply(variables, e, s)
    ge, gs = xai.multimodal_saliency(fwd, eeg_in[:2], spec_in[:2])
    assert ge.shape == (2, 1, 37, 600) and gs.shape == (2, 3, 80, 60)

    eeg_fwd = lambda e: mm.apply(variables, e, method=mm.forward_eeg)
    shap_vals = xai.gradient_shap_values(eeg_fwd, eeg_in[:1], eeg_in,
                                         jax.random.PRNGKey(0), nsamples=4)
    idx, _ = xai.get_top_n_channels(np.asarray(shap_vals), n=5)
    assert len(idx) == 5


@pytest.mark.slow
def test_wavenet_pipeline_with_eeg_transform(rng):
    """The main_2.py path: raw cache windows → _EEGTransformer chain →
    DilatedInceptionWaveNet training step (SURVEY.md §3.2)."""
    raw = rng.standard_normal((6, 2000, 19)).astype(np.float32) * 100
    cfg = C.EEGTransformConfig(apply_chris_magic_ch8=True, n_feats=8)
    x = ops.eeg_transform(jnp.asarray(raw), cfg)     # (6, 400, 8)
    assert x.shape == (6, 400, 8)
    model = models.DilatedInceptionWaveNet(block_layers=(3, 2),
                                           block_dims=(8, 8))
    tx = train.state.make_optimizer(1e-3)
    state = train.create_train_state(model, (x,), tx, jax.random.PRNGKey(0))
    step = train.make_train_step()
    y = jnp.asarray(np.eye(6, dtype=np.float32))
    batch = {"x": x, "y": y}
    l0 = None
    for i in range(10):
        state, m = step(state, batch, jax.random.PRNGKey(2))
        l0 = l0 or float(m["loss"])
    assert float(m["loss"]) < l0


@pytest.mark.slow
def test_diffeeg_trainer_smoke(tmp_path, rng):
    """DiffEEG training loop end-to-end at toy scale (SURVEY.md §3.3)."""
    from multimodal_brain_pattern_identification_xai_tpu.models import DiffEEG
    import dataclasses
    cfg = C.DiffEEGConfig(n_channels=4, input_length=128, hidden_channels=8,
                          n_diffusion_steps=8, gradient_accumulate_every=2,
                          batch_size=4, evaluate_every=2,
                          save_and_sample_every=100, min_steps=3,
                          stft_n_fft=32, stft_noverlap=16)
    model = DiffEEG(n_channels=4, hidden=8)
    trainer = train.DiffEEGTrainer(model, cfg, ckpt_dir=str(tmp_path))

    def batches():
        while True:
            x = rng.standard_normal((4, 4, 128)).astype(np.float32)
            y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, 4)]
            yield x, y

    val = [(rng.standard_normal((2, 4, 128)).astype(np.float32),
            np.eye(6, dtype=np.float32)[[0, 1]])]
    hist = trainer.train(batches, val_batches=val, total_steps=3)
    assert len(hist["loss"]) == 3
    assert all(np.isfinite(l) for l in hist["loss"])
    assert hist["eval"] and {"mmd", "frechet", "pearson"} <= set(hist["eval"][0])


def test_diffeeg_fused_accum_trains(rng):
    """fuse_accum folds f micro-batches into each scanned fwd/bwd pass
    (same averaged gradient at equal micro sizes; f× larger MXU batches).
    The fused trainer must run and its loss magnitude match the unfused
    trainer's on identical data (not bitwise — mixup pairing pools and
    per-pass keys differ by construction)."""
    from multimodal_brain_pattern_identification_xai_tpu.models import DiffEEG
    import dataclasses
    base = C.DiffEEGConfig(n_channels=4, input_length=128, hidden_channels=8,
                           n_diffusion_steps=8, gradient_accumulate_every=4,
                           batch_size=4, evaluate_every=100,
                           save_and_sample_every=100, min_steps=1,
                           stft_n_fft=32, stft_noverlap=16)
    xs = jnp.asarray(rng.standard_normal((4, 4, 4, 128)), jnp.float32)
    ys = jnp.asarray(np.eye(6, dtype=np.float32)[
        rng.integers(0, 6, (4, 4))])
    losses = {}
    for f in (1, 2):
        cfg = dataclasses.replace(base, fuse_accum=f)
        tr = train.DiffEEGTrainer(DiffEEG(n_channels=4, hidden=8), cfg,
                                  ckpt_dir=None, seed=0)
        _, _, loss = tr._train_step(tr.state, tr.ema,
                                    jax.random.PRNGKey(3), xs, ys)
        losses[f] = float(loss)
    assert np.isfinite(losses[1]) and np.isfinite(losses[2])
    # both are MSE of unit-variance noise prediction at init → ~1
    assert abs(losses[1] - losses[2]) < 0.3

    bad = dataclasses.replace(base, fuse_accum=3)   # 3 ∤ 4
    tr = train.DiffEEGTrainer(DiffEEG(n_channels=4, hidden=8), bad,
                              ckpt_dir=None, seed=0)
    with pytest.raises(ValueError, match="fuse_accum"):
        tr._train_step(tr.state, tr.ema, jax.random.PRNGKey(3), xs, ys)

"""Spectrogram train-time augmentation (ops.spectrogram_augment) — the
jittable equivalent of the reference's albumentations pipeline
(XAI_Multimodality.py:523-533)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_brain_pattern_identification_xai_tpu import config as C
from multimodal_brain_pattern_identification_xai_tpu import ops


@pytest.fixture
def batch(rng):
    spec = rng.random((8, 3, 40, 30)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, 8)]
    return jnp.asarray(spec), jnp.asarray(y)


def test_shapes_and_determinism(batch):
    spec, y = batch
    key = jax.random.PRNGKey(0)
    s1, y1 = ops.spectrogram_augment(key, spec, y, spec, y)
    s2, y2 = ops.spectrogram_augment(key, spec, y, spec, y)
    assert s1.shape == spec.shape and y1.shape == y.shape
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_probability_zero_is_identity(batch):
    spec, y = batch
    cfg = C.SpecAugmentConfig(mixup_prob=0.0, dropout_prob=0.0)
    s, yo = ops.spectrogram_augment(jax.random.PRNGKey(1), spec, y,
                                    spec, y, cfg)
    np.testing.assert_allclose(np.asarray(s), np.asarray(spec), atol=1e-6)
    np.testing.assert_allclose(np.asarray(yo), np.asarray(y), atol=1e-6)


def test_labels_stay_simplex(batch):
    spec, y = batch
    cfg = C.SpecAugmentConfig(mixup_prob=1.0, dropout_prob=0.0)
    _, yo = ops.spectrogram_augment(jax.random.PRNGKey(2), spec, y,
                                    spec, y, cfg)
    np.testing.assert_allclose(np.asarray(yo).sum(1), 1.0, rtol=1e-5)
    assert (np.asarray(yo) >= 0).all()


def test_mixup_blends_against_reference(batch):
    spec, y = batch
    ref = jnp.zeros_like(spec)
    ref_y = jnp.full_like(y, 1.0 / 6.0)
    cfg = C.SpecAugmentConfig(mixup_prob=1.0, dropout_prob=0.0)
    s, yo = ops.spectrogram_augment(jax.random.PRNGKey(3), spec, y,
                                    ref, ref_y, cfg)
    s, yo = np.asarray(s), np.asarray(yo)
    # every sample is a λ·x + (1-λ)·0 shrink; λ per-sample from the image,
    # and the label must use the SAME λ
    lam = s.sum((1, 2, 3)) / np.asarray(spec).sum((1, 2, 3))
    assert ((lam > 0) & (lam <= 1.0 + 1e-6)).all()
    expect = lam[:, None] * np.asarray(y) + (1 - lam[:, None]) / 6.0
    np.testing.assert_allclose(yo, expect, atol=1e-4)


def test_dropout_masks_expected_fraction(rng):
    spec = jnp.ones((64, 1, 50, 60))
    y = jnp.full((64, 6), 1.0 / 6.0)
    cfg = C.SpecAugmentConfig(mixup_prob=0.0, dropout_prob=1.0,
                              stripe_frac=(0.06, 0.1))
    s, _ = ops.spectrogram_augment(jax.random.PRNGKey(4), spec, y,
                                   spec, y, cfg)
    s = np.asarray(s)
    # each sample: one full-height time stripe + one full-width freq stripe
    zero_frac = 1.0 - s.mean()
    assert 0.1 < zero_frac < 0.22            # ≈ 2×8% minus overlap
    for i in range(8):
        cols = (s[i, 0] == 0).all(axis=0)    # fully-zero time columns
        rows = (s[i, 0] == 0).all(axis=1)
        assert cols.any() and rows.any()
        # stripes are contiguous
        on = np.flatnonzero(cols)
        assert (np.diff(on) == 1).all()


def test_jit_under_vmap_safe(batch):
    spec, y = batch
    fn = jax.jit(lambda k: ops.spectrogram_augment(k, spec, y, spec, y))
    s, yo = fn(jax.random.PRNGKey(5))
    assert np.isfinite(np.asarray(s)).all()

"""Forward / reverse diffusion as jitted programs.

The reference's ``reverse_diffusion`` (DiffEEG_utils.py:146-177) is a
Python loop of 1000 sequential denoiser forwards per batch — hot loop #4 of
the survey.  Here the whole trajectory is one ``lax.scan`` inside a single
jit: the model runs 1000 times on-device with no host round trips, and
sampling batches scale freely across the mesh.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule


def q_sample(schedule: DiffusionSchedule, key: jax.Array, x0: jnp.ndarray,
             t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward diffusion ``x_t = √ᾱ_t x₀ + √(1−ᾱ_t) ε``
    (DiffEEG_utils.py:139-144).  ``t``: (B,) int steps."""
    noise = jax.random.normal(key, x0.shape, x0.dtype)
    a = schedule.alpha_bar[t].reshape((-1,) + (1,) * (x0.ndim - 1))
    x_t = jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise
    return x_t, noise


def reverse_diffusion(schedule: DiffusionSchedule,
                      denoise_fn: Callable[..., jnp.ndarray],
                      key: jax.Array,
                      batch_size: int,
                      class_labels: jnp.ndarray,
                      spectrogram: jnp.ndarray,
                      shape: Tuple[int, int],
                      nan_guard: bool = True) -> jnp.ndarray:
    """Reference reverse sampler (DiffEEG_utils.py:146-177) as one scan.

    Update rule kept verbatim: ``x ← x − β_t ε̂`` plus re-noising
    ``√β_t ε`` for t > 0.  The reference aborts the Python loop on NaN;
    with ``nan_guard=True`` the scan freezes the state instead (same
    observable behavior: the last finite iterate is returned).

    Args:
        denoise_fn: ``(x, y_onehot, t_float, spec) → ε̂``.
        shape: (n_channels, T) of the generated EEG.
    """
    key, init_key = jax.random.split(key)
    x0 = jax.random.normal(init_key, (batch_size,) + shape)
    T = schedule.timesteps

    def step(carry, t):
        x, k = carry
        k, nk = jax.random.split(k)
        t_vec = jnp.full((batch_size,), t, jnp.float32)
        eps = denoise_fn(x, class_labels, t_vec, spectrogram)
        x_new = x - schedule.beta[t] * eps
        noise = jax.random.normal(nk, x.shape, x.dtype)
        x_new = jnp.where(t > 0, x_new + schedule.noise_scale[t] * noise,
                          x_new)
        if nan_guard:
            ok = jnp.all(jnp.isfinite(x_new))
            x_new = jnp.where(ok, x_new, x)
        return (x_new, k), None

    (x, _), _ = jax.lax.scan(step, (x0, key), jnp.arange(T - 1, -1, -1))
    return x


def ddpm_sample(schedule: DiffusionSchedule,
                denoise_fn: Callable[..., jnp.ndarray],
                key: jax.Array,
                batch_size: int,
                class_labels: jnp.ndarray,
                spectrogram: jnp.ndarray,
                shape: Tuple[int, int]) -> jnp.ndarray:
    """Textbook DDPM ancestral sampler (x ← (x − β/√(1−ᾱ) ε̂)/√α + σ ε)
    over the linear-β schedule — provided alongside the reference's
    nonstandard update as the numerically-sound alternative."""
    beta = schedule.beta
    alpha = 1.0 - beta
    alpha_bar = jnp.cumprod(alpha)

    key, init_key = jax.random.split(key)
    x0 = jax.random.normal(init_key, (batch_size,) + shape)
    T = schedule.timesteps

    def step(carry, t):
        x, k = carry
        k, nk = jax.random.split(k)
        t_vec = jnp.full((batch_size,), t, jnp.float32)
        eps = denoise_fn(x, class_labels, t_vec, spectrogram)
        coef = beta[t] / jnp.sqrt(1.0 - alpha_bar[t])
        mean = (x - coef * eps) / jnp.sqrt(alpha[t])
        noise = jax.random.normal(nk, x.shape, x.dtype)
        x_new = jnp.where(t > 0, mean + jnp.sqrt(beta[t]) * noise, mean)
        return (x_new, k), None

    (x, _), _ = jax.lax.scan(step, (x0, key), jnp.arange(T - 1, -1, -1))
    return x

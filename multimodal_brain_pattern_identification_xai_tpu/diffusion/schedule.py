"""Noise schedules (reference ``DiffEEGDiffusion.__init__`` /
``_get_noise_schedule``, DiffEEG_utils.py:110-137).

The reference keeps two schedules side by side: a linear β ∈ [1e-4, 0.02]
used by the reverse sampler's step size / re-noising scale, and a cosine
ᾱ schedule used by the forward q-sample.  Both reproduced verbatim.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(timesteps: int, beta_start: float = 1e-4,
                         beta_end: float = 0.02) -> np.ndarray:
    """β_t linear ramp (DiffEEG_utils.py:117)."""
    return np.linspace(beta_start, beta_end, timesteps, dtype=np.float32)


def cosine_alpha_schedule(timesteps: int, s: float = 0.008):
    """Cosine ᾱ_t and its β_t (DiffEEG_utils.py:127-137).

    Returns (alpha_bar, beta) float32.  Note the reference defines
    ``beta = 1 - alpha/alpha[0]`` (a cumulative quantity, not a per-step β)
    — reproduced as-is since the forward process consumes only ᾱ.
    """
    f_t = np.cos((np.linspace(0, 1, timesteps) + s) / (1 + s) * np.pi / 2) ** 2
    alpha_bar = f_t / f_t[0]
    beta = 1.0 - alpha_bar / alpha_bar[0]
    return alpha_bar.astype(np.float32), beta.astype(np.float32)


class DiffusionSchedule(NamedTuple):
    """All per-step constants, device-resident."""
    alpha_bar: jnp.ndarray   # (T,) cosine ᾱ for q-sample
    beta: jnp.ndarray        # (T,) linear β for the reverse update
    noise_scale: jnp.ndarray  # (T,) √β re-noising scale
    timesteps: int

    @property
    def num_timesteps(self) -> int:
        return self.timesteps


def make_schedule(timesteps: int = 1000) -> DiffusionSchedule:
    alpha_bar, _ = cosine_alpha_schedule(timesteps)
    beta = linear_beta_schedule(timesteps)
    return DiffusionSchedule(
        alpha_bar=jnp.asarray(alpha_bar),
        beta=jnp.asarray(beta),
        noise_scale=jnp.sqrt(jnp.asarray(beta)),
        timesteps=timesteps,
    )

"""Parameter EMA (reference ``EMA``, DiffEEG_utils.py:82-97): classic
exponential moving average with warmup — before ``step_start_ema`` the EMA
weights are reset to the online weights; afterwards updated every
``update_ema_every`` steps.  Pure pytree functions, jit-safe."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMA(NamedTuple):
    params: Any
    beta: float = 0.995
    step_start_ema: int = 20
    update_every: int = 10

    @staticmethod
    def create(params: Any, beta: float = 0.995, step_start_ema: int = 20,
               update_every: int = 10) -> "EMA":
        return EMA(jax.tree_util.tree_map(jnp.asarray, params), beta,
                   step_start_ema, update_every)


def ema_update(ema: EMA, params: Any, step: jnp.ndarray) -> EMA:
    """One (conditional) EMA step, mirroring the reference's trainer logic
    (DiffEEG_train.py:163-169): reset before warmup, decay-update every
    ``update_every`` steps after it."""
    def blend(old, new):
        return old * ema.beta + new * (1.0 - ema.beta)

    decayed = jax.tree_util.tree_map(blend, ema.params, params)
    warm = step < ema.step_start_ema
    due = (step % ema.update_every) == 0

    new_params = jax.tree_util.tree_map(
        lambda reset, dec, old: jnp.where(warm, reset,
                                          jnp.where(due, dec, old)),
        params, decayed, ema.params)
    return ema._replace(params=new_params)

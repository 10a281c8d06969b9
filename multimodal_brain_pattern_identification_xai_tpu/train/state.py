"""Train state: params + optimizer + BatchNorm stats (+ optional EMA) in
one pytree — the jittable unification of the reference's three checkpoint
schemes (SURVEY.md §5.4)."""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    ema_params: Any = None


def create_train_state(model, sample_batch_args, tx: optax.GradientTransformation,
                       rng: jax.Array, with_ema: bool = False) -> TrainState:
    """Initialize a model and wrap everything into a TrainState.

    Args:
        sample_batch_args: tuple of example inputs for ``model.init``.
    """
    variables = model.init({"params": rng}, *sample_batch_args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        batch_stats=batch_stats,
        ema_params=jax.tree_util.tree_map(jnp.asarray, params) if with_ema else None,
    )


def make_optimizer(lr: Any, weight_decay: float = 0.0,
                   grad_accum_steps: int = 1,
                   optimizer: str = "adam") -> optax.GradientTransformation:
    """Adam(W) with injectable learning rate (so host-side schedules like
    ReduceLROnPlateau can steer it) and optional gradient accumulation
    (reference grad_accum_steps, cfg_utils.py:118)."""
    if optimizer == "adam" and weight_decay == 0.0:
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    elif optimizer in ("adam", "adamw"):
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay)
    elif optimizer == "sgd":
        tx = optax.inject_hyperparams(optax.sgd)(learning_rate=lr)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def freeze_except(tx: optax.GradientTransformation, params: Any,
                  names_to_train: Any) -> optax.GradientTransformation:
    """Fine-tuning gate (reference ``freeze_except``,
    DiffEEG_utils.py:603-606): only parameters whose path contains one of
    the ``names_to_train`` substrings receive optimizer updates; the rest
    are frozen (the ``requires_grad`` analogue via ``optax.masked``)."""
    import flax

    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    labels = flax.traverse_util.unflatten_dict(
        {k: ("train" if any(n in "/".join(k) for n in names_to_train)
             else "freeze") for k in flat})
    # NOT optax.masked: masked passes gradients through UNTOUCHED for
    # masked-out leaves — frozen params must get zero updates
    return optax.multi_transform({"train": tx,
                                  "freeze": optax.set_to_zero()}, labels)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Override the injected learning rate (for plateau-style host control)."""
    opt_state = state.opt_state
    inner = opt_state.inner_opt_state if isinstance(
        opt_state, optax.MultiStepsState) else opt_state
    if hasattr(inner, "hyperparams"):
        inner.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state

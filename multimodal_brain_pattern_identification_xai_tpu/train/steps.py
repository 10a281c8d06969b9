"""Jitted train/eval steps (the TPU replacement for the reference's
``MainTrainer._train_epoch``/``_eval_epoch`` inner loops,
training_utils.py:635-736).

One compiled XLA program per step: forward (+BN stat update), loss with
soft KLDiv targets (+ optional manual L2 term), backward, optimizer
update.  Mixed precision is XLA-native on TPU (bf16 matmul passes for f32
operands); grad accumulation comes from ``optax.MultiSteps`` in the
optimizer.  The same factories serve single-branch and multimodal batches.

Loss note: ``kldiv_with_logits`` applies ``log_softmax``, which is
idempotent on the log-prob outputs most zoo models emit — so one loss
covers both the log-prob models and the raw-logit WaveNet, exactly
mirroring how the reference pairs ``LogSoftmax`` models with ``KLDivLoss``
and logit models with ``KLDivWithLogitsLoss``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .losses import kldiv_with_logits, l2_regularization
from .state import TrainState


def _default_apply(state: TrainState, params, batch: Dict[str, Any],
                   train: bool, rngs, mutable):
    variables = {"params": params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    args: Tuple
    if "eeg" in batch:                      # multimodal
        args = (batch["eeg"], batch["spec"], train)
    else:
        args = (batch["x"], train)
    return state.apply_fn(variables, *args, rngs=rngs, mutable=mutable)


def make_train_step(loss_fn: Callable = kldiv_with_logits,
                    l2_lambda: float = 0.0,
                    ema_decay: Optional[float] = None,
                    nan_sentinel: bool = True) -> Callable:
    """Build a jitted ``(state, batch, rng) -> (state, metrics)`` step.

    ``nan_sentinel`` (SURVEY.md §5.3 rebuild plan): when the loss or any
    gradient is non-finite, the update is SKIPPED (params unchanged) and
    ``metrics['nonfinite']`` flags the event — the in-jit analogue of the
    reference's NaN-abort guards (DiffEEG_utils.py:152-176), without
    aborting the compiled step.
    """

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, Any],
                   rng: jax.Array):
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}
        mutable = ["batch_stats"] if state.batch_stats is not None else False

        def compute_loss(params):
            out = _default_apply(state, params, batch, True, rngs, mutable)
            logits, updates = out if mutable else (out, {})
            loss = loss_fn(logits, batch["y"])
            if l2_lambda:
                loss = loss + l2_regularization(params, l2_lambda)
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)

        grad_norm = optax_global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        if nan_sentinel:
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)

        new_state = state.apply_gradients(grads=grads)
        if nan_sentinel:
            # keep optimizer state untouched on a skipped step, but let
            # the step counter advance — the batch/PRNG stream position
            # was consumed either way (resume-exactness)
            new_state = skip_nonfinite(new_state, state, finite).replace(
                step=state.step + 1)
        if mutable:
            new_bs = updates["batch_stats"]
            if nan_sentinel:
                # a non-finite loss usually means the activations were bad
                # too — don't fold the poisoned batch statistics in either
                new_bs = skip_nonfinite(new_bs, state.batch_stats, finite)
            new_state = new_state.replace(batch_stats=new_bs)
        if ema_decay is not None and new_state.ema_params is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                new_state.ema_params, new_state.params)
            if nan_sentinel:
                # the EMA must not decay toward (even frozen) params on a
                # skipped step
                new_ema = skip_nonfinite(new_ema, new_state.ema_params,
                                         finite)
            new_state = new_state.replace(ema_params=new_ema)
        state = new_state
        metrics = {"loss": loss,
                   "grad_norm": grad_norm,
                   "nonfinite": ~finite}
        return state, metrics

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.vdot(x, x).real for x in leaves))


def skip_nonfinite(new, old, finite):
    """Sentinel revert: ``where(finite, new, old)`` across matching array
    leaves — ONE implementation of the skip contract shared by the
    single-device, mesh and DiffEEG step factories.  The step counter is
    NOT preserved by this helper; callers re-advance it so a skipped step
    still consumes its slot in the data/PRNG stream (resume-exactness)."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(finite, n, o)
        if isinstance(n, jnp.ndarray) and n.shape == jnp.shape(o)
        else n,
        new, old)


def make_eval_step(loss_fn: Callable = kldiv_with_logits,
                   use_ema: bool = False) -> Callable:
    """Build a jitted ``(state, batch) -> (logits, loss)`` eval step."""

    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, Any]):
        params = state.ema_params if (use_ema and state.ema_params
                                      is not None) else state.params
        logits = _default_apply(state, params, batch, False, None, False)
        return logits, loss_fn(logits, batch["y"])

    return eval_step

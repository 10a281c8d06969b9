"""Mesh-parallel training step.

The DDP equivalent (training_distributed.py:22-141), built on ``shard_map``
with an explicit gradient ``psum`` over the ``data`` axis:

* every device computes its local micro-batch's gradients with the exact
  single-device program (no GSPMD re-partitioning of the backward pass —
  this matters: XLA's SPMD partitioner silently zeroes grouped-convolution
  gradients on multi-axis meshes, a bug tests/test_parallel.py pins);
* gradients and the loss are ``psum``-averaged over ``data`` (the NCCL
  all-reduce of DDP, riding ICI inside the compiled step);
* BatchNorm batch statistics are computed per shard and psum-averaged
  before being folded into the running stats (DDP-with-synced-running-
  stats semantics);
* the optimizer update runs on the replicated gradients — identical on
  every device, no resharding.

``state_shardings`` (GSPMD named shardings incl. tensor-parallel dense
kernels) is retained for models where the partitioner path is safe and
for the TP demos in :mod:`.tp`.
"""

from __future__ import annotations


import re
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..train.losses import kldiv_with_logits, l2_regularization
from ..train.state import TrainState
from ..train.steps import optax_global_norm, skip_nonfinite
from . import mesh as mesh_lib


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put a host batch with the leading axis sharded over ``data``."""
    out = {}
    for k, v in batch.items():
        sh = mesh_lib.batch_sharding(mesh, jnp.ndim(v))
        out[k] = jax.device_put(jnp.asarray(v), sh)
    return out


def state_shardings(mesh: Mesh, state: TrainState,
                    tp_patterns=mesh_lib._TP_PATTERNS) -> Any:
    """Sharding pytree matching ``state``: tensor-parallel on dense kernels
    whose path matches a TP pattern, replicated for other arrays, ``None``
    for non-array leaves."""
    regexes = [re.compile(p) for p in tp_patterns]
    repl = mesh_lib.replicate(mesh)

    def assign(path, leaf):
        if not isinstance(leaf, (jax.Array, np.ndarray)):
            return None
        name = jax.tree_util.keystr(path).replace("'", "").replace(
            "[", "/").replace("]", "")
        if leaf.ndim >= 2 and any(r.search(name) for r in regexes):
            spec = [None] * leaf.ndim
            spec[-1] = "model"
            return NamedSharding(mesh, P(*spec))
        return repl

    return jax.tree_util.tree_map_with_path(assign, state)


def make_parallel_train_step(mesh: Mesh, state: TrainState,
                             loss_fn: Callable = kldiv_with_logits,
                             l2_lambda: float = 0.0,
                             donate: bool = True,
                             nan_sentinel: bool = True) -> Callable:
    """Build the data-parallel train step for a given state structure.

    ``nan_sentinel`` mirrors :func:`..train.steps.make_train_step`: a
    non-finite loss or gradient skips the update (params, optimizer state
    and batch statistics unchanged) and flags ``metrics['nonfinite']`` —
    the psum-averaged loss/grads are replicated, so every device takes the
    same branch and the mesh stays in lockstep.
    """
    has_bn = state.batch_stats is not None

    def local_grads(params, batch_stats, batch, rng, step):
        """Per-shard loss/grads; psum-averaged over 'data'."""
        # decorrelate dropout masks across shards (DDP ranks would
        # otherwise draw identical masks from the shared key)
        shard_key = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        rngs = {"dropout": jax.random.fold_in(shard_key, step)}

        def compute_loss(p):
            variables = {"params": p}
            if has_bn:
                variables["batch_stats"] = batch_stats
            if "eeg" in batch:
                args = (batch["eeg"], batch["spec"], True)
            else:
                args = (batch["x"], True)
            out = state.apply_fn(variables, *args, rngs=rngs,
                                 mutable=["batch_stats"] if has_bn else False)
            logits, updates = out if has_bn else (out, {})
            loss = loss_fn(logits, batch["y"])
            if l2_lambda:
                loss = loss + l2_regularization(p, l2_lambda)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params)
        loss = jax.lax.pmean(loss, "data")
        grads = jax.lax.pmean(grads, "data")
        if has_bn:
            updates = {"batch_stats": jax.lax.pmean(
                updates["batch_stats"], "data")}
        return loss, grads, updates

    def step_fn(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        specs = jax.tree_util.tree_map(lambda _: P("data"), batch)
        fn = shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), P(), specs, P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False)
        bs = state.batch_stats if has_bn else {}
        loss, grads, updates = fn(state.params, bs, batch,
                                  rng, jnp.asarray(state.step))
        grad_norm = optax_global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        if nan_sentinel:
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        new_state = state.apply_gradients(grads=grads)
        if nan_sentinel:
            # keep optimizer state untouched on a skipped step; the step
            # counter still advances (the stream position was consumed)
            new_state = skip_nonfinite(new_state, state, finite).replace(
                step=state.step + 1)
        if has_bn:
            new_bs = updates["batch_stats"]
            if nan_sentinel:
                new_bs = skip_nonfinite(new_bs, state.batch_stats, finite)
            new_state = new_state.replace(batch_stats=new_bs)
        return new_state, {"loss": loss, "grad_norm": grad_norm,
                           "nonfinite": ~finite}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def replay_dp_loss_single_device(state: TrainState, batch: Dict[str, Any],
                                 rng: jax.Array, dp: int,
                                 loss_fn: Callable = kldiv_with_logits,
                                 l2_lambda: float = 0.0) -> jnp.ndarray:
    """Single-device replay of the loss :func:`make_parallel_train_step`
    reports for a ``dp``-way data mesh — the independent reference the
    multichip dry-run asserts against (the driver artifact then certifies
    the mesh MATH, not just loss finiteness).

    Reproduces the per-shard semantics serially on one device: the batch
    is split into ``dp`` shards, each forward uses the shard's
    rank-decorrelated dropout key (``fold_in(fold_in(rng, shard), step)``
    — exactly ``local_grads``'s derivation) and its own BatchNorm batch
    statistics (train-mode ``mutable`` apply on the shard slice, matching
    DDP's per-rank BN), and the reported loss is the pmean, i.e. the
    arithmetic mean of shard losses.  Models with dropout/BN therefore
    compare EXACTLY (up to f32 reduction order) — unlike a plain
    full-batch forward, which legitimately differs for them.
    """
    has_bn = state.batch_stats is not None
    B = batch["y"].shape[0]
    if B % dp:
        raise ValueError(f"batch {B} not divisible by dp={dp}")
    shard = B // dp
    losses = []
    for i in range(dp):
        sl = {k: jnp.asarray(v)[i * shard:(i + 1) * shard]
              for k, v in batch.items()}
        shard_key = jax.random.fold_in(jnp.asarray(rng), i)
        rngs = {"dropout": jax.random.fold_in(shard_key,
                                              jnp.asarray(state.step))}
        variables = {"params": state.params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
        args = ((sl["eeg"], sl["spec"], True) if "eeg" in sl
                else (sl["x"], True))
        out = state.apply_fn(variables, *args, rngs=rngs,
                             mutable=["batch_stats"] if has_bn else False)
        logits = out[0] if has_bn else out
        loss = loss_fn(logits, sl["y"])
        if l2_lambda:
            loss = loss + l2_regularization(state.params, l2_lambda)
        losses.append(loss)
    return jnp.mean(jnp.stack(losses))

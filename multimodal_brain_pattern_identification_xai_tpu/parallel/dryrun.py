"""Full multi-chip training step: DP × TP × SP in one jit.

This is the driver-facing dry-run path (``__graft_entry__.dryrun_multichip``)
and the template for pod-scale training: a (data, model, seq) mesh where

* the batch is sharded over ``data`` (gradient psum = DDP),
* the long-EEG encoder's time axis is sharded over ``seq``
  (all-gather-KV attention + psum pooling inside, :mod:`.seqparallel`),
* the classifier head is tensor-parallel over ``model``
  (column→row dense pair, :mod:`.tp`).

Differentiation happens OUTSIDE the shard_map with replication checking
ON: shard_map's varying-axes machinery then inserts the pbroadcast/psum
corrections that make cotangents of replicated parameters exact.  (Taking
``jax.grad`` *inside* with ``check_vma=False`` leaves per-leaf replication
factors — psum's transpose is psum — that are easy to get subtly wrong;
tests/test_aux_components.py pins exact equality against the single-device
step.)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .seqparallel import LongEEGEncoder
from . import tp


def init_dp_tp_sp_params(key: jax.Array, encoder: LongEEGEncoder,
                         head_hidden: int = 128) -> Dict[str, Any]:
    """Encoder params (replicated) + full-size TP head kernels (sharded at
    device-put time by their PartitionSpecs)."""
    k_enc, k1, k2 = jax.random.split(key, 3)
    enc_params = encoder.init(k_enc)
    D = encoder.d_model
    lecun = jax.nn.initializers.lecun_normal()
    # The encoder's own head becomes an identity passthrough: the TP head
    # classifies from the pooled embedding instead.
    enc_params["head"] = jnp.eye(D)
    enc_params["head_b"] = jnp.zeros((D,))
    return {
        "enc": enc_params,
        "k1": lecun(k1, (D, head_hidden)),
        "b1": jnp.zeros((head_hidden,)),
        "k2": lecun(k2, (head_hidden, encoder.n_classes)),
        "b2": jnp.zeros((encoder.n_classes,)),
    }


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    specs = jax.tree_util.tree_map(lambda _: P(), params)
    specs["k1"] = P(None, "model")
    specs["b1"] = P("model")
    specs["k2"] = P("model", None)
    return specs


def make_dp_tp_sp_train_step(mesh: Mesh, encoder: LongEEGEncoder,
                             lr: float = 1e-3):
    """Build the jitted one-step SGD training function
    ``(params, x, y) -> (new_params, loss)`` with x (B, C, T) sharded
    P('data', None, 'seq') and y (B, n_classes) sharded P('data')."""

    def local_loss(params, x_local, y_local):
        pooled = encoder.local_forward(params["enc"], x_local,
                                       axis_name="seq")        # (b_loc, D)
        logits = tp.tp_mlp(pooled, params["k1"], params["b1"],
                           params["k2"], params["b2"],
                           activation=jax.nn.relu, axis_name="model")
        logp = jax.nn.log_softmax(logits, axis=-1)
        total = jax.lax.psum(-jnp.sum(y_local * logp), "data")
        count = jax.lax.psum(jnp.asarray(y_local.shape[0], logp.dtype),
                             "data")
        return total / count

    def loss_fn(params, x, y):
        sp = param_specs(params)
        fn = shard_map(local_loss, mesh=mesh,
                       in_specs=(sp, P("data", None, "seq"), P("data")),
                       out_specs=P())    # replication checking ON
        return fn(params, x, y)

    @jax.jit
    def step(params, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        new_params = jax.tree_util.tree_map(lambda p_, g_: p_ - lr * g_,
                                            params, grads)
        return new_params, loss

    return step


def place_inputs(mesh: Mesh, params: Dict[str, Any], x, y):
    """Device-put params/batch with their mesh shardings."""
    sp = param_specs(params)
    params = jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, sp)
    x = jax.device_put(jnp.asarray(x),
                       NamedSharding(mesh, P("data", None, "seq")))
    y = jax.device_put(jnp.asarray(y), NamedSharding(mesh, P("data")))
    return params, x, y

"""Explicit tensor-parallel dense layers (shard_map building blocks).

Megatron-style pair: a column-parallel dense (kernel split on output
features, no communication in) followed by a row-parallel dense (kernel
split on input features, one ``psum`` out).  Used by the multi-chip
dry-run to shard the fusion head's FC128→FC6 (models.py:350-379) over the
``model`` axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def column_parallel_dense(x: jnp.ndarray, kernel_shard: jnp.ndarray,
                          bias_shard: Optional[jnp.ndarray] = None
                          ) -> jnp.ndarray:
    """x: (..., D_in) replicated; kernel_shard: (D_in, D_out/P) local.
    Returns local (..., D_out/P) activations — no collective."""
    y = x @ kernel_shard
    if bias_shard is not None:
        y = y + bias_shard
    return y


def row_parallel_dense(x_shard: jnp.ndarray, kernel_shard: jnp.ndarray,
                       bias: Optional[jnp.ndarray] = None,
                       axis_name: str = "model") -> jnp.ndarray:
    """x_shard: (..., D_in/P) local; kernel_shard: (D_in/P, D_out) local.
    psum over ``axis_name`` completes the contraction; bias added once."""
    y = jax.lax.psum(x_shard @ kernel_shard, axis_name)
    if bias is not None:
        y = y + bias
    return y


def tp_mlp(x: jnp.ndarray, k1_shard: jnp.ndarray, b1_shard: jnp.ndarray,
           k2_shard: jnp.ndarray, b2: jnp.ndarray,
           activation=jax.nn.relu, axis_name: str = "model") -> jnp.ndarray:
    """Column→activation→row: the fusion head FC128→ReLU→FC6 with the
    hidden axis sharded over ``model`` and exactly one psum."""
    h = activation(column_parallel_dense(x, k1_shard, b1_shard))
    return row_parallel_dense(h, k2_shard, b2, axis_name)


def shard_kernel_columns(kernel: jnp.ndarray, index: jnp.ndarray,
                         n_shards: int) -> jnp.ndarray:
    """Static slice helper: take this shard's output-feature columns."""
    size = kernel.shape[-1] // n_shards
    return jax.lax.dynamic_slice_in_dim(kernel, index * size, size, axis=-1)


def shard_kernel_rows(kernel: jnp.ndarray, index: jnp.ndarray,
                      n_shards: int) -> jnp.ndarray:
    size = kernel.shape[0] // n_shards
    return jax.lax.dynamic_slice_in_dim(kernel, index * size, size, axis=0)

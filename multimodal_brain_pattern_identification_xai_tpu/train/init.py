"""Weight-init helpers (reference ``initialize_kaiming_weights``,
training_utils.py:135-147: He-normal fan-out for conv/linear kernels,
zeros bias, ones/zeros BatchNorm)."""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp


def initialize_kaiming_weights(params: Any, key: jax.Array) -> Any:
    """Re-initialize a flax param tree with Kaiming-normal(fan_out) kernels
    and constant norms/biases — apply after ``model.init`` when reference
    init parity is wanted."""
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    keys = jax.random.split(key, max(len(flat), 1))
    out = {}
    he = jax.nn.initializers.he_normal(in_axis=-2, out_axis=-1)
    for i, (path, leaf) in enumerate(sorted(flat.items())):
        name = path[-1]
        if name == "kernel" and leaf.ndim >= 2:
            # he_normal with fan_out: swap axes roles
            fan_out = leaf.shape[-1] * int(jnp.prod(
                jnp.asarray(leaf.shape[:-2])) or 1)
            std = (2.0 / max(fan_out, 1)) ** 0.5
            out[path] = std * jax.random.normal(keys[i], leaf.shape,
                                                leaf.dtype)
        elif name in ("bias",):
            out[path] = jnp.zeros_like(leaf)
        elif name == "scale":
            out[path] = jnp.ones_like(leaf)
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)

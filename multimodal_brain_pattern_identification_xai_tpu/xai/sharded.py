"""Pod-sharded attribution (BASELINE.json config #5: "batched IG/SHAP
attribution (vmapped baselines, pod-sharded)").

Integrated gradients and expected gradients are embarrassingly parallel
over the *samples* axis; these wrappers shard that axis over the mesh's
``data`` axis with a sharded jit — each chip computes its samples'
(baseline × step) sweep locally, no collectives needed, results gathered
on exit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .expected_gradients import expected_gradients, gradient_shap_values
from .integrated_gradients import integrated_gradients


def sharded_integrated_gradients(mesh: Mesh,
                                 forward: Callable[[jnp.ndarray], jnp.ndarray],
                                 x: jnp.ndarray,
                                 baseline: Optional[jnp.ndarray] = None,
                                 target: Optional[jnp.ndarray] = None,
                                 steps: int = 50) -> jnp.ndarray:
    """IG with the sample axis sharded over ``data``.  ``x``: (B, ...)
    with B divisible by the data-axis size."""
    data_sh = NamedSharding(mesh, P("data"))
    x = jax.device_put(x, data_sh)
    if baseline is None:
        baseline = jnp.zeros_like(x)
    baseline = jax.device_put(baseline, data_sh)
    if target is None:
        target = jnp.argmax(forward(x), axis=-1)
    target = jax.device_put(target, data_sh)

    fn = jax.jit(lambda xx, bb, tt: integrated_gradients(
        forward, xx, bb, tt, steps))
    return fn(x, baseline, target)


def sharded_expected_gradients(mesh: Mesh,
                               forward: Callable[[jnp.ndarray], jnp.ndarray],
                               x: jnp.ndarray,
                               background: jnp.ndarray,
                               key: jax.Array,
                               target: jnp.ndarray,
                               nsamples: int = 200) -> jnp.ndarray:
    """Expected gradients with samples sharded over ``data`` and the
    background set replicated (every chip draws against the full
    background, like shap's GradientExplainer)."""
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    x = jax.device_put(x, data_sh)
    background = jax.device_put(background, repl)
    target = jax.device_put(target, data_sh)

    fn = jax.jit(lambda xx, bg, tt: expected_gradients(
        forward, xx, bg, key, tt, nsamples))
    return fn(x, background, target)


def sharded_gradient_shap_values(mesh: Mesh,
                                 forward: Callable[[jnp.ndarray],
                                                   jnp.ndarray],
                                 x: jnp.ndarray,
                                 background: jnp.ndarray,
                                 key: jax.Array,
                                 n_classes: int = 6,
                                 nsamples: int = 200) -> jnp.ndarray:
    """Per-class ``GradientExplainer.shap_values`` with the explained
    samples sharded over ``data`` and the background replicated — the
    pod-sharded form of :func:`gradient_shap_values` (every chip runs the
    full per-class Monte-Carlo sweep on its sample shard).  ``x``:
    (B, ...) with B divisible by the data-axis size; returns
    (n_classes, B, ...)."""
    data_sh = NamedSharding(mesh, P(None, "data"))
    x = jax.device_put(x, NamedSharding(mesh, P("data")))
    background = jax.device_put(background, NamedSharding(mesh, P()))
    fn = jax.jit(lambda xx, bg: gradient_shap_values(
        forward, xx, bg, key, n_classes, nsamples),
        out_shardings=data_sh)
    return fn(x, background)

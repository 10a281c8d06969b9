"""Grad-CAM via ``vjp`` on sown conv feature maps (BASELINE.json: "Grad-CAM
via vjp on conv feature maps ... at <2x inference cost").

Every zoo model sows its last conv map as ``intermediates/feature_map``
and adds a flax perturbation at the same point, so the gradient of any
logit w.r.t. the feature map is exactly the gradient w.r.t. the (zero)
perturbation — one forward (captures A) + one backward (∂y_c/∂A), both
inside a single jit.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp


def _find_feature_entry(tree, name="feature_map"):
    """Locate the (path, value) of the sown feature map in a pytree."""
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(tree))
    for path, value in flat.items():
        if name in path[-2:]:
            return path, value
    raise KeyError(f"no '{name}' entry found; paths: {list(flat)[:5]}")


def grad_cam(model, variables, x: jnp.ndarray,
             target: Optional[jnp.ndarray] = None,
             upsample_to: Optional[Tuple[int, int]] = None,
             apply_kwargs: Optional[dict] = None) -> jnp.ndarray:
    """Grad-CAM heatmaps for a batch.

    Args:
        model/variables: flax module (must sow + perturb 'feature_map')
            and its variables (params [+ batch_stats]).
        x: (B, ...) model input (reference NCHW layout).
        target: (B,) class indices; default argmax.
        upsample_to: optional (H, W) bilinear upsample of the cam.

    Returns (B, H', W') nonnegative, per-sample max-normalized heatmaps.
    """
    apply_kwargs = apply_kwargs or {}

    # Forward once: logits + actual feature-map value (defines shapes).
    logits, inter = model.apply(variables, x, mutable=["intermediates"],
                                **apply_kwargs)
    path, value = _find_feature_entry(inter["intermediates"])
    feat = value[0] if isinstance(value, tuple) else value   # sow stores tuple
    if target is None:
        target = jnp.argmax(logits, axis=-1)

    # Backward: grad of the target logits w.r.t. a zero perturbation added
    # at the feature map (flax perturb mechanism).
    zeros = {  # batch-shaped zeros override the init-time placeholder
        "feature_map": jnp.zeros_like(feat)}
    # rebuild the nested perturbations dict along the module path
    for name in reversed([p for p in path[:-1] if p != "intermediates"]):
        zeros = {name: zeros}

    def score(pert):
        out = model.apply({**variables, "perturbations": pert}, x,
                          **apply_kwargs)
        return jnp.sum(jnp.take_along_axis(out, target[:, None], -1))

    grads = jax.grad(score)(zeros)
    gflat = flax.traverse_util.flatten_dict(grads)
    gmap = next(iter(gflat.values()))                        # (B, H, W, C)

    # Grad-CAM: channel weights = GAP of grads; cam = ReLU(Σ w_c · A_c).
    weights = jnp.mean(gmap, axis=(1, 2), keepdims=True)
    cam = jnp.maximum(jnp.sum(weights * feat, axis=-1), 0.0)  # (B, H, W)
    if upsample_to is not None:
        cam = jax.image.resize(cam, (cam.shape[0],) + tuple(upsample_to),
                               method="bilinear")
    denom = jnp.max(cam, axis=(1, 2), keepdims=True)
    return cam / jnp.maximum(denom, 1e-12)

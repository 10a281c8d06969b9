"""Torch → flax weight conversion.

The reference's ``SpectrogramViT`` wraps torchvision's pretrained
``vit_b_16`` (models.py:689-715).  This environment has no network egress,
so pretrained weights cannot be fetched — but when a torchvision ViT state
dict exists on disk, :func:`load_torch_vit_state_dict` maps it onto
:class:`..models.vit.SpectrogramViT` params.  Note the reference *replaces*
the positional embedding with fresh Gaussian noise for the 400×300 grid
(models.py:702-705), so positional embeddings are intentionally NOT
imported — matching that behavior exactly.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def load_torch_vit_state_dict(state_dict: Dict[str, Any],
                              flax_params: Dict[str, Any],
                              depth: int = 12) -> Dict[str, Any]:
    """Map a torchvision ``vit_b_16`` state dict onto SpectrogramViT params.

    Imports: patch-projection conv, per-layer LN / attention / MLP weights,
    final LN and class token.  Skips: positional embeddings (re-randomized
    by the reference) and the classification head (replaced with the
    6-class head).
    """
    import flax
    p = flax.core.unfreeze(flax_params)

    # patch projection: torch (D, 3, 16, 16) OIHW → flax (16, 16, 3, D)
    w = _t(state_dict["conv_proj.weight"])
    p["conv_proj"]["kernel"] = w.transpose(2, 3, 1, 0)
    p["conv_proj"]["bias"] = _t(state_dict["conv_proj.bias"])
    p["class_token"] = _t(state_dict["class_token"]).reshape(
        p["class_token"].shape)

    for i in range(depth):
        src = f"encoder.layers.encoder_layer_{i}"
        dst = p[f"encoder_layer_{i}"]
        dst["ln_1"]["scale"] = _t(state_dict[f"{src}.ln_1.weight"])
        dst["ln_1"]["bias"] = _t(state_dict[f"{src}.ln_1.bias"])
        dst["ln_2"]["scale"] = _t(state_dict[f"{src}.ln_2.weight"])
        dst["ln_2"]["bias"] = _t(state_dict[f"{src}.ln_2.bias"])

        D = dst["ln_1"]["scale"].shape[0]
        n_heads = len(dst["self_attention"]["query"]["bias"])
        head_dim = D // (dst["self_attention"]["query"]["kernel"].shape[1]
                         if dst["self_attention"]["query"]["kernel"].ndim == 2
                         else dst["self_attention"]["query"]["kernel"].shape[1])
        # torch packs qkv: (3D, D) weight, (3D,) bias
        wqkv = _t(state_dict[f"{src}.self_attention.in_proj_weight"])
        bqkv = _t(state_dict[f"{src}.self_attention.in_proj_bias"])
        qw, kw, vw = np.split(wqkv, 3, axis=0)
        qb, kb, vb = np.split(bqkv, 3, axis=0)
        attn = dst["self_attention"]
        nh = attn["query"]["kernel"].shape[1]
        hd = attn["query"]["kernel"].shape[2]
        for name, wmat, bvec in (("query", qw, qb), ("key", kw, kb),
                                 ("value", vw, vb)):
            # torch (D, D) out-in → flax (D_in, n_heads, head_dim)
            attn[name]["kernel"] = wmat.T.reshape(D, nh, hd)
            attn[name]["bias"] = bvec.reshape(nh, hd)
        wo = _t(state_dict[f"{src}.self_attention.out_proj.weight"])
        bo = _t(state_dict[f"{src}.self_attention.out_proj.bias"])
        attn["out"]["kernel"] = wo.T.reshape(nh, hd, D)
        attn["out"]["bias"] = bo

        dst["mlp_0"]["kernel"] = _t(state_dict[f"{src}.mlp.0.weight"]).T
        dst["mlp_0"]["bias"] = _t(state_dict[f"{src}.mlp.0.bias"])
        dst["mlp_3"]["kernel"] = _t(state_dict[f"{src}.mlp.3.weight"]).T
        dst["mlp_3"]["bias"] = _t(state_dict[f"{src}.mlp.3.bias"])

    p["ln"]["scale"] = _t(state_dict["encoder.ln.weight"])
    p["ln"]["bias"] = _t(state_dict["encoder.ln.bias"])
    return p

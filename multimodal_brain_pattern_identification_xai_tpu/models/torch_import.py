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


def _bn(params: Dict[str, Any], stats: Dict[str, Any],
        state_dict: Dict[str, Any], src: str) -> None:
    """Copy one torch BatchNorm (affine + running stats) in place."""
    params["scale"] = _t(state_dict[f"{src}.weight"])
    params["bias"] = _t(state_dict[f"{src}.bias"])
    stats["mean"] = _t(state_dict[f"{src}.running_mean"])
    stats["var"] = _t(state_dict[f"{src}.running_var"])


def _conv_oihw(w) -> np.ndarray:
    """torch conv weight (O, I, H, W) → flax (H, W, I, O)."""
    return _t(w).transpose(2, 3, 1, 0)


def load_torch_eegnet_state_dict(state_dict: Dict[str, Any],
                                 flax_variables: Dict[str, Any],
                                 f1: int = 8, d: int = 2) -> Dict[str, Any]:
    """Map a reference-trained torch ``EEGNet`` state dict (layer names from
    models.py:239-289: conv1/batchnorm1/depthwiseConv/batchnorm2/
    separableConv/batchnorm3/dense) onto :class:`..models.eegnet.EEGNet`
    variables.  Returns a full ``{"params", "batch_stats"}`` dict whose
    eval-mode logits match the torch module exactly (pinned by
    tests/test_aux_components.py::test_torch_eegnet_import_logit_parity).
    """
    import flax
    v = flax.core.unfreeze(flax_variables)
    _map_eegnet_stem(v["params"]["stem"], v["batch_stats"]["stem"],
                     state_dict, f1, d)
    v["params"]["dense"]["kernel"] = _t(state_dict["dense.weight"]).T
    v["params"]["dense"]["bias"] = _t(state_dict["dense.bias"])
    return v


def _map_eegnet_stem(p: Dict[str, Any], s: Dict[str, Any],
                     state_dict: Dict[str, Any], f1: int, d: int) -> None:
    """Copy the shared EEGNet stem (conv1/batchnorm1/depthwiseConv/
    batchnorm2/separableConv/batchnorm3) in place."""
    p["conv1"]["kernel"] = _conv_oihw(state_dict["conv1.weight"])
    _bn(p["bn1"], s["bn1"], state_dict, "batchnorm1")
    # torch depthwise (F1·D, 1, Chans, 1), groups=F1, out index g·D+d
    # → flax contraction kernel K[h, g, d] of shape (Chans, F1, D)
    w = _t(state_dict["depthwiseConv.weight"])[:, 0, :, 0]   # (F1·D, Chans)
    p["depthwiseConv_kernel"] = w.reshape(f1, d, -1).transpose(2, 0, 1)
    _bn(p["bn2"], s["bn2"], state_dict, "batchnorm2")
    p["separableConv"]["kernel"] = _conv_oihw(state_dict["separableConv.weight"])
    _bn(p["BatchNorm_0"], s["BatchNorm_0"], state_dict, "batchnorm3")


def _dense(p: Dict[str, Any], state_dict: Dict[str, Any], src: str) -> None:
    """Copy one torch Linear (weight transposed to flax kernel) in place."""
    p["kernel"] = _t(state_dict[f"{src}.weight"]).T
    p["bias"] = _t(state_dict[f"{src}.bias"])


def load_torch_eegnet_attention_state_dict(state_dict: Dict[str, Any],
                                           flax_variables: Dict[str, Any],
                                           f1: int = 8, d: int = 2
                                           ) -> Dict[str, Any]:
    """Map a reference-trained torch ``EEGNetAttentionRegularized`` state
    dict (XAI_Multimodality.py:990-1076: the EEGNet stem + single-head
    attention ``attention_layer.{query,key,value}`` + ``dense1``/``dense2``)
    onto :class:`..models.eegnet.EEGNetAttentionRegularized` variables.
    Eval-mode log-probs match torch exactly (pinned by
    tests/test_models.py)."""
    import flax
    v = flax.core.unfreeze(flax_variables)
    _map_eegnet_stem(v["params"]["stem"], v["batch_stats"]["stem"],
                     state_dict, f1, d)
    att = v["params"]["attention_layer"]
    for name in ("query", "key", "value"):
        _dense(att[name], state_dict, f"attention_layer.{name}")
    _dense(v["params"]["dense1"], state_dict, "dense1")
    _dense(v["params"]["dense2"], state_dict, "dense2")
    return v


def load_torch_speccnn_state_dict(state_dict: Dict[str, Any],
                                  flax_variables: Dict[str, Any],
                                  n_blocks: int = 5) -> Dict[str, Any]:
    """Map a reference-trained torch ``Spectrogram_Model`` state dict
    (models.py:42-107: five Blocks of conv1-3 + bn + conv1x1 skip, then
    ``fc``) onto :class:`..models.speccnn.SpectrogramCNN` variables.

    Works for both the standard and the ``fused_blocks=N`` serving model —
    the fused blocks' parameter shells mirror ``nn.Conv`` names/shapes.
    Eval-mode log-probs match torch exactly (the skip path uses the 2-tap
    half-pixel lerp of ``F.interpolate(..., align_corners=False)``, no
    anti-alias prefilter — see ``models.layers.bilinear_interpolate_nhwc``)."""
    import flax
    v = flax.core.unfreeze(flax_variables)
    for i in range(n_blocks):
        blk, src = f"block{i+1}", f"block{i+1}"
        p, s = v["params"][blk], v["batch_stats"][blk]
        for j in range(3):
            p[f"conv{j+1}"]["kernel"] = _conv_oihw(
                state_dict[f"{src}.conv{j+1}.weight"])
            p[f"conv{j+1}"]["bias"] = _t(state_dict[f"{src}.conv{j+1}.bias"])
        _bn(p["BatchNorm_0"], s["BatchNorm_0"], state_dict, f"{src}.bn")
        p["conv1x1"]["kernel"] = _conv_oihw(
            state_dict[f"{src}.conv1x1.weight"])
        p["conv1x1"]["bias"] = _t(state_dict[f"{src}.conv1x1.bias"])
    _dense(v["params"]["fc"], state_dict, "fc")
    return v


def load_torch_multimodal_state_dict(state_dict: Dict[str, Any],
                                     flax_variables: Dict[str, Any],
                                     f1: int = 8, d: int = 2
                                     ) -> Dict[str, Any]:
    """Map a reference-trained combined ``MultimodalModel`` state dict
    (XAI_Multimodality.py:1082-1108: ``eeg_model.*`` =
    EEGNetAttentionRegularized, ``spectrogram_model.*`` =
    Spectrogram_Model, fusion head ``fc1``/``fc2``) onto
    :class:`..models.fusion.MultimodalModel` variables — the one-call
    "switch with your trained reference weights" path.  Eval-mode
    log-probs match torch exactly (pinned by tests/test_models.py)."""
    import flax

    def sub(prefix):
        n = len(prefix)
        return {k[n:]: x for k, x in state_dict.items()
                if k.startswith(prefix)}

    v = flax.core.unfreeze(flax_variables)
    ve = load_torch_eegnet_attention_state_dict(
        sub("eeg_model."),
        {"params": v["params"]["eeg_model"],
         "batch_stats": v["batch_stats"]["eeg_model"]}, f1, d)
    v["params"]["eeg_model"] = ve["params"]
    v["batch_stats"]["eeg_model"] = ve["batch_stats"]
    vs = load_torch_speccnn_state_dict(
        sub("spectrogram_model."),
        {"params": v["params"]["spectrogram_model"],
         "batch_stats": v["batch_stats"]["spectrogram_model"]})
    v["params"]["spectrogram_model"] = vs["params"]
    v["batch_stats"]["spectrogram_model"] = vs["batch_stats"]
    _dense(v["params"]["fc1"], state_dict, "fc1")
    _dense(v["params"]["fc2"], state_dict, "fc2")
    return v


def load_torch_efficientnet_state_dict(state_dict: Dict[str, Any],
                                       flax_variables: Dict[str, Any],
                                       ) -> Dict[str, Any]:
    """Map a torchvision ``efficientnet_b0`` state dict onto
    :class:`..models.efficientnet.EfficientNetB0` variables.

    torchvision layout: ``features.0`` stem Conv+BN; ``features.{1..7}``
    stages of MBConv blocks (``block.0`` expand Conv+BN when expand≠1,
    then depthwise Conv+BN, SqueezeExcitation ``fc1``/``fc2``, project
    Conv+BN); ``features.8`` head Conv+BN; ``classifier.1`` Linear.  The
    classifier is imported only when its output width matches (the
    reference replaces ImageNet's 1000-way head with the 6-class head).
    Eval-mode logits match torch exactly — the flax model uses torch's
    symmetric (k-1)//2 padding on strided convs for this reason.
    """
    import flax
    from .efficientnet import B0_STAGES
    v = flax.core.unfreeze(flax_variables)
    p, s = v["params"], v["batch_stats"]

    p["stem_conv"]["kernel"] = _conv_oihw(state_dict["features.0.0.weight"])
    _bn(p["BatchNorm_0"], s["BatchNorm_0"], state_dict, "features.0.1")

    for si, (e, _c, r, _s, _k) in enumerate(B0_STAGES):
        for ri in range(r):
            src = f"features.{si + 1}.{ri}.block"
            dst_p, dst_s = p[f"stage{si}_block{ri}"], s[f"stage{si}_block{ri}"]
            i = 0
            if e != 1:
                dst_p["expand_conv"]["kernel"] = _conv_oihw(
                    state_dict[f"{src}.{i}.0.weight"])
                _bn(dst_p["BatchNorm_0"], dst_s["BatchNorm_0"], state_dict,
                    f"{src}.{i}.1")
                i += 1
            bn_dw, bn_pr = (f"BatchNorm_{i}", f"BatchNorm_{i + 1}")
            # depthwise: torch (C, 1, k, k) → flax (k, k, 1, C)
            dst_p["depthwise_conv"]["kernel"] = _conv_oihw(
                state_dict[f"{src}.{i}.0.weight"])
            _bn(dst_p[bn_dw], dst_s[bn_dw], state_dict, f"{src}.{i}.1")
            i += 1
            for fc, name in (("fc1", "reduce"), ("fc2", "expand")):
                dst_p["se"][name]["kernel"] = _conv_oihw(
                    state_dict[f"{src}.{i}.{fc}.weight"])
                dst_p["se"][name]["bias"] = _t(state_dict[f"{src}.{i}.{fc}.bias"])
            i += 1
            dst_p["project_conv"]["kernel"] = _conv_oihw(
                state_dict[f"{src}.{i}.0.weight"])
            _bn(dst_p[bn_pr], dst_s[bn_pr], state_dict, f"{src}.{i}.1")

    p["head_conv"]["kernel"] = _conv_oihw(state_dict["features.8.0.weight"])
    _bn(p["BatchNorm_1"], s["BatchNorm_1"], state_dict, "features.8.1")
    head_w = _t(state_dict["classifier.1.weight"])
    if head_w.shape[0] == p["classifier"]["kernel"].shape[1]:
        p["classifier"]["kernel"] = head_w.T
        p["classifier"]["bias"] = _t(state_dict["classifier.1.bias"])
    return v


def _conv1d(p: Dict[str, Any], state_dict: Dict[str, Any], src: str) -> None:
    """Copy one torch Conv1d (weight (O, I, k) → flax kernel (k, I, O))."""
    p["kernel"] = _t(state_dict[f"{src}.weight"]).transpose(2, 1, 0)
    p["bias"] = _t(state_dict[f"{src}.bias"])


def _gn(p: Dict[str, Any], state_dict: Dict[str, Any], src: str) -> None:
    """Copy one torch GroupNorm affine."""
    p["scale"] = _t(state_dict[f"{src}.weight"])
    p["bias"] = _t(state_dict[f"{src}.bias"])


def load_torch_diffeeg_state_dict(state_dict: Dict[str, Any],
                                  flax_variables: Dict[str, Any]
                                  ) -> Dict[str, Any]:
    """Map a reference-trained torch ``DiffEEG`` denoiser state dict
    (diffEEG.py:20-134 — the layout of the 502 shipped
    ``exp_dump_path/model_*.pt`` checkpoints' ``model``/``ema`` entries)
    onto :class:`..models.diffeeg.DiffEEG` variables.

    The upsampler's torch ``ConvTranspose2d(stride=(1,8), padding=(1,2))``
    equals the flax module's ``padding=((1,1),(0,0))`` with a spatially
    FLIPPED kernel (flax pads ``k-1-p`` per side and does not flip);
    1×1/k3 Conv1d weights transpose (O, I, k) → (k, I, O).  Eval-mode
    outputs match torch exactly (pinned by tests/test_diffusion.py)."""
    import flax
    v = flax.core.unfreeze(flax_variables)
    p = v["params"]
    for i in (0, 2, 4):
        _dense(p[f"step_mlp_{i}"], state_dict, f"step_embedding_mlp.{i}")
    p["class_embedding"]["embedding"] = _t(
        state_dict["class_embedding.weight"])
    w = _t(state_dict["spectrogram_upsample1.weight"])     # (I, O, kh, kw)
    p["spectrogram_upsample1"]["kernel"] = (
        w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())
    p["spectrogram_upsample1"]["bias"] = _t(
        state_dict["spectrogram_upsample1.bias"])
    for name in ("channel_expand", "spectrogram_project", "input_conv",
                 "skip_sum"):
        _conv1d(p[name], state_dict, name)
    _conv1d(p["gtu"]["conv1"], state_dict, "gtu.conv1")
    _conv1d(p["gtu"]["conv2"], state_dict, "gtu.conv2")
    for i in range(1, 5):
        blk = p[f"res_block{i}"]
        _conv1d(blk["conv_in"], state_dict, f"res_block{i}.0")
        _conv1d(blk["conv_dil"], state_dict, f"res_block{i}.2")
        _conv1d(blk["conv_out"], state_dict, f"res_block{i}.3")
        _gn(blk["norm"], state_dict, f"res_block{i}.4")
    _gn(p["layer_norm"], state_dict, "layer_norm")
    _conv1d(p["final_0"], state_dict, "final_projection.0")
    _gn(p["final_norm"], state_dict, "final_projection.2")
    _conv1d(p["final_out"], state_dict, "final_projection.3")
    return v


def load_torch_diffeeg_legacy_state_dict(state_dict: Dict[str, Any],
                                         flax_variables: Dict[str, Any]
                                         ) -> Dict[str, Any]:
    """Map a torch state dict of the reference's LEGACY DiffEEG variant
    (diffusion_model.py:8-167, dead code there) onto
    :class:`..models.diffeeg_legacy.DiffEEGLegacy` variables.

    Same conventions as :func:`load_torch_diffeeg_state_dict`: Linear
    weights transpose, Conv1d (O, I, k) → (k, I, O), Conv2d
    (O, I, kh, kw) → (kh, kw, I, O), and ConvTranspose2d (I, O, kh, kw)
    → spatially FLIPPED (kh, kw, I, O) (flax pads ``k−1−p`` per side and
    does not flip).  Output parity pinned by tests/test_diffusion.py."""
    import flax
    v = flax.core.unfreeze(flax_variables)
    p = v["params"]
    for i in (0, 2, 4):
        _dense(p[f"step_mlp_{i}"], state_dict, f"step_embedding_mlp.{i}")
    p["class_embedding"]["embedding"] = _t(
        state_dict["class_embedding.weight"])
    for name in ("spectrogram_upconv1", "spectrogram_upconv2"):
        w = _t(state_dict[f"{name}.weight"])               # (I, O, kh, kw)
        p[name]["kernel"] = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
        p[name]["bias"] = _t(state_dict[f"{name}.bias"])
    w = _t(state_dict["spectrogram_embed.weight"])         # (O, I, 1, 1)
    p["spectrogram_embed"]["kernel"] = w.transpose(2, 3, 1, 0)
    p["spectrogram_embed"]["bias"] = _t(state_dict["spectrogram_embed.bias"])
    for name in ("input_conv", "skip_sum", "output_conv"):
        _conv1d(p[name], state_dict, name)
    for i in range(1, 5):
        blk = p[f"res_block{i}"]
        _conv1d(blk["conv_in"], state_dict, f"res_block{i}.0")
        _conv1d(blk["conv_dil"], state_dict, f"res_block{i}.2")
        _conv1d(blk["conv_out"], state_dict, f"res_block{i}.4")
    return v

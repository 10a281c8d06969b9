"""Fabricated reference-style torch models (models.py layouts), built
functionally so torch autograd flows through them — shared by the
logit-parity import tests and the attribution-fidelity golden tests.

``make_torch_eegnet``              plain EEGNet (models.py:239-289)
``make_torch_eegnet_attention``    EEGNetAttentionRegularized
                                   (XAI_Multimodality.py:990-1076)
``make_torch_speccnn``             Spectrogram_Model (models.py:42-107)
``make_torch_multimodal``          MultimodalModel
                                   (XAI_Multimodality.py:1082-1108)
"""

from __future__ import annotations


def make_torch_eegnet(seed: int = 0, f1: int = 8, d: int = 2, f2: int = 16,
                      chans: int = 37, samples: int = 480):
    """Returns ``(state_dict, torch_forward)`` where ``torch_forward`` is a
    differentiable eval-mode forward producing log-probs like the
    reference's ``EEGNet`` (LogSoftmax output)."""
    torch = __import__("torch")
    F = torch.nn.functional
    g = torch.Generator().manual_seed(seed)
    rn = lambda *s: torch.randn(*s, generator=g) * 0.3
    sd = {
        "conv1.weight": rn(f1, 1, 1, 64),
        "depthwiseConv.weight": rn(f1 * d, 1, chans, 1),
        "separableConv.weight": rn(f2, f1 * d, 1, 16),
        "dense.weight": rn(6, f2 * (samples // 32)),
        "dense.bias": rn(6),
    }
    for bn, c in (("batchnorm1", f1), ("batchnorm2", f1 * d),
                  ("batchnorm3", f2)):
        sd[f"{bn}.weight"] = rn(c)
        sd[f"{bn}.bias"] = rn(c)
        sd[f"{bn}.running_mean"] = rn(c) * 0.1
        sd[f"{bn}.running_var"] = torch.rand(c, generator=g) + 0.5

    def torch_forward(x):
        bn = lambda t, n: F.batch_norm(
            t, sd[f"{n}.running_mean"], sd[f"{n}.running_var"],
            sd[f"{n}.weight"], sd[f"{n}.bias"], training=False, eps=1e-5)
        x = bn(F.conv2d(x, sd["conv1.weight"], padding="same"), "batchnorm1")
        x = bn(F.conv2d(x, sd["depthwiseConv.weight"], groups=f1),
               "batchnorm2")
        x = F.avg_pool2d(F.elu(x), (1, 4))
        x = bn(F.conv2d(x, sd["separableConv.weight"], padding="same"),
               "batchnorm3")
        x = F.avg_pool2d(F.elu(x), (1, 8))
        x = F.linear(x.flatten(1), sd["dense.weight"], sd["dense.bias"])
        return F.log_softmax(x, dim=1)

    return sd, torch_forward


def make_torch_eegnet_attention(seed: int = 0, f1: int = 8, d: int = 2,
                                f2: int = 16, chans: int = 37,
                                samples: int = 480):
    """(state_dict, forward) for the notebook's EEGNetAttentionRegularized
    (XAI_Multimodality.py:990-1076): the plain-EEGNet stem, a single-head
    scaled-dot attention over the time tokens, then dense1(128)→dense2(6)
    →LogSoftmax (no activation between the denses — :1069-1073)."""
    torch = __import__("torch")
    F = torch.nn.functional
    g = torch.Generator().manual_seed(seed)
    rn = lambda *s: torch.randn(*s, generator=g) * 0.3
    t_len = samples // 32
    sd = {
        "conv1.weight": rn(f1, 1, 1, 64),
        "depthwiseConv.weight": rn(f1 * d, 1, chans, 1),
        "separableConv.weight": rn(f2, f1 * d, 1, 16),
        "attention_layer.query.weight": rn(f2, f2),
        "attention_layer.query.bias": rn(f2),
        "attention_layer.key.weight": rn(f2, f2),
        "attention_layer.key.bias": rn(f2),
        "attention_layer.value.weight": rn(f2, f2),
        "attention_layer.value.bias": rn(f2),
        "dense1.weight": rn(128, f2 * t_len),
        "dense1.bias": rn(128),
        "dense2.weight": rn(6, 128),
        "dense2.bias": rn(6),
    }
    for bn, c in (("batchnorm1", f1), ("batchnorm2", f1 * d),
                  ("batchnorm3", f2)):
        sd[f"{bn}.weight"] = rn(c)
        sd[f"{bn}.bias"] = rn(c)
        sd[f"{bn}.running_mean"] = rn(c) * 0.1
        sd[f"{bn}.running_var"] = torch.rand(c, generator=g) + 0.5

    def torch_forward(x):
        bn = lambda t, n: F.batch_norm(
            t, sd[f"{n}.running_mean"], sd[f"{n}.running_var"],
            sd[f"{n}.weight"], sd[f"{n}.bias"], training=False, eps=1e-5)
        x = bn(F.conv2d(x, sd["conv1.weight"], padding="same"), "batchnorm1")
        x = bn(F.conv2d(x, sd["depthwiseConv.weight"], groups=f1),
               "batchnorm2")
        x = F.avg_pool2d(F.elu(x), (1, 4))
        x = bn(F.conv2d(x, sd["separableConv.weight"], padding="same"),
               "batchnorm3")
        x = F.avg_pool2d(F.elu(x), (1, 8))
        b, c, h, w = x.shape
        t = x.flatten(2).permute(0, 2, 1)                  # (B, L, F2)
        q = F.linear(t, sd["attention_layer.query.weight"],
                     sd["attention_layer.query.bias"])
        k = F.linear(t, sd["attention_layer.key.weight"],
                     sd["attention_layer.key.bias"])
        v = F.linear(t, sd["attention_layer.value.weight"],
                     sd["attention_layer.value.bias"])
        w_att = F.softmax(q @ k.transpose(-2, -1) * f2 ** -0.5, dim=-1)
        x = (w_att @ v).permute(0, 2, 1).reshape(b, c, h, w)
        x = F.linear(x.flatten(1), sd["dense1.weight"], sd["dense1.bias"])
        x = F.linear(x, sd["dense2.weight"], sd["dense2.bias"])
        return F.log_softmax(x, dim=1)

    return sd, torch_forward


def make_torch_speccnn(seed: int = 0, widths=(16, 32, 64, 128, 256)):
    """(state_dict, forward) for the reference Spectrogram_Model
    (models.py:42-107): five Blocks (3×conv3x3+ReLU → pool → BN → skip via
    bilinear interpolate + conv1x1) → GAP → fc → LogSoftmax."""
    torch = __import__("torch")
    F = torch.nn.functional
    g = torch.Generator().manual_seed(seed)
    rn = lambda *s: torch.randn(*s, generator=g) * 0.15
    pools = ("max", "avg", "max", "avg", "max")
    sd = {}
    cin = 3
    for i, co in enumerate(widths):
        p = f"block{i+1}"
        for j in range(3):
            sd[f"{p}.conv{j+1}.weight"] = rn(co, cin if j == 0 else co, 3, 3)
            sd[f"{p}.conv{j+1}.bias"] = rn(co)
        sd[f"{p}.bn.weight"] = rn(co)
        sd[f"{p}.bn.bias"] = rn(co)
        sd[f"{p}.bn.running_mean"] = rn(co) * 0.1
        sd[f"{p}.bn.running_var"] = torch.rand(co, generator=g) + 0.5
        sd[f"{p}.conv1x1.weight"] = rn(co, cin, 1, 1)
        sd[f"{p}.conv1x1.bias"] = rn(co)
        cin = co
    sd["fc.weight"] = rn(6, widths[-1])
    sd["fc.bias"] = rn(6)

    def torch_forward(x):
        for i in range(len(widths)):
            p = f"block{i+1}"
            identity = x
            for j in range(3):
                x = F.relu(F.conv2d(x, sd[f"{p}.conv{j+1}.weight"],
                                    sd[f"{p}.conv{j+1}.bias"], padding=1))
            x = (F.max_pool2d(x, 2) if pools[i] == "max"
                 else F.avg_pool2d(x, 2))
            x = F.batch_norm(x, sd[f"{p}.bn.running_mean"],
                             sd[f"{p}.bn.running_var"], sd[f"{p}.bn.weight"],
                             sd[f"{p}.bn.bias"], training=False, eps=1e-5)
            if identity.shape != x.shape:
                identity = F.interpolate(identity, size=x.shape[2:],
                                         mode="bilinear",
                                         align_corners=False)
                identity = F.conv2d(identity, sd[f"{p}.conv1x1.weight"],
                                    sd[f"{p}.conv1x1.bias"])
            x = x + identity
        x = F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
        x = F.linear(x, sd["fc.weight"], sd["fc.bias"])
        return F.log_softmax(x, dim=1)

    return sd, torch_forward


def make_torch_multimodal(seed: int = 0, samples: int = 480):
    """(state_dict, forward) for the notebook's combined MultimodalModel
    (XAI_Multimodality.py:1082-1108): concat the two branches' 6-dim
    log-prob outputs → ReLU(fc1: 12→128) → fc2 → LogSoftmax.  Branch state
    dicts are nested under the reference's ``eeg_model.`` /
    ``spectrogram_model.`` prefixes."""
    torch = __import__("torch")
    F = torch.nn.functional
    g = torch.Generator().manual_seed(seed + 99)
    rn = lambda *s: torch.randn(*s, generator=g) * 0.3
    eeg_sd, eeg_fwd = make_torch_eegnet_attention(seed, samples=samples)
    spec_sd, spec_fwd = make_torch_speccnn(seed + 1)
    sd = {f"eeg_model.{k}": v for k, v in eeg_sd.items()}
    sd.update({f"spectrogram_model.{k}": v for k, v in spec_sd.items()})
    sd["fc1.weight"] = rn(128, 12)
    sd["fc1.bias"] = rn(128)
    sd["fc2.weight"] = rn(6, 128)
    sd["fc2.bias"] = rn(6)

    def torch_forward(eeg, spec):
        combined = torch.cat((eeg_fwd(eeg), spec_fwd(spec)), dim=1)
        x = F.relu(F.linear(combined, sd["fc1.weight"], sd["fc1.bias"]))
        x = F.linear(x, sd["fc2.weight"], sd["fc2.bias"])
        return F.log_softmax(x, dim=1)

    return sd, torch_forward


def make_torch_diffeeg(seed: int = 0, n_channels: int = 4, hidden: int = 16,
                       n_classes: int = 6):
    """(state_dict, forward) for the live reference DiffEEG denoiser
    (diffEEG.py:20-134): step-embedding MLP, class embedding, the
    ConvTranspose2d(stride=(1,8), padding=(1,2)) spectrogram upsampler +
    lerp + 1×1 convs + GTU conditioning, four dilated residual Sequentials
    (NO residual add — diffEEG.py:125-129 chains them), skip-sum +
    GroupNorm(1), final projection.  Eval mode (dropout off, no same-class
    spectrogram recombination)."""
    torch = __import__("torch")
    F = torch.nn.functional
    g = torch.Generator().manual_seed(seed)
    rn = lambda *s: torch.randn(*s, generator=g) * 0.3
    H, C = hidden, n_channels
    sd = {
        "class_embedding.weight": rn(n_classes, H),
        "spectrogram_upsample1.weight": rn(C, H // 2, 3, 3),
        "spectrogram_upsample1.bias": rn(H // 2),
        "channel_expand.weight": rn(H, H // 2, 1),
        "channel_expand.bias": rn(H),
        "spectrogram_project.weight": rn(H, H, 1),
        "spectrogram_project.bias": rn(H),
        "gtu.conv1.weight": rn(H, H, 1), "gtu.conv1.bias": rn(H),
        "gtu.conv2.weight": rn(H, H, 1), "gtu.conv2.bias": rn(H),
        "input_conv.weight": rn(H, C, 1), "input_conv.bias": rn(H),
        "skip_sum.weight": rn(H, H, 1), "skip_sum.bias": rn(H),
        "layer_norm.weight": rn(H), "layer_norm.bias": rn(H),
        "final_projection.0.weight": rn(H, H, 1),
        "final_projection.0.bias": rn(H),
        "final_projection.2.weight": rn(H),
        "final_projection.2.bias": rn(H),
        "final_projection.3.weight": rn(C, H, 1),
        "final_projection.3.bias": rn(C),
    }
    for i in (0, 2, 4):
        sd[f"step_embedding_mlp.{i}.weight"] = rn(H, H)
        sd[f"step_embedding_mlp.{i}.bias"] = rn(H)
    for r, dil in ((1, 1), (2, 2), (3, 4), (4, 8)):
        sd[f"res_block{r}.0.weight"] = rn(H, H, 1)
        sd[f"res_block{r}.0.bias"] = rn(H)
        sd[f"res_block{r}.2.weight"] = rn(H, H, 3)
        sd[f"res_block{r}.2.bias"] = rn(H)
        sd[f"res_block{r}.3.weight"] = rn(H, H, 1)
        sd[f"res_block{r}.3.bias"] = rn(H)
        sd[f"res_block{r}.4.weight"] = rn(H)
        sd[f"res_block{r}.4.bias"] = rn(H)

    import numpy as _np

    def torch_forward(x, y, t, spec):
        B, _, T = x.shape
        half = H // 2
        emb = torch.exp(torch.arange(half)
                        * (-_np.log(10000.0) / (half - 1)))
        emb = t.view(-1, 1) * emb
        se = torch.cat((emb.sin(), emb.cos()), dim=-1).view(-1, H)
        se = F.linear(se, sd["step_embedding_mlp.0.weight"],
                      sd["step_embedding_mlp.0.bias"]).sigmoid()
        se = F.relu(F.linear(se, sd["step_embedding_mlp.2.weight"],
                             sd["step_embedding_mlp.2.bias"]))
        se = F.linear(se, sd["step_embedding_mlp.4.weight"],
                      sd["step_embedding_mlp.4.bias"])
        step_emb = se.unsqueeze(-1).expand(-1, -1, T)
        labels = y.argmax(dim=1).long()
        class_emb = sd["class_embedding.weight"][labels].unsqueeze(-1)

        s = F.conv_transpose2d(spec, sd["spectrogram_upsample1.weight"],
                               sd["spectrogram_upsample1.bias"],
                               stride=(1, 8), padding=(1, 2))
        s = F.relu(s).flatten(start_dim=2)
        s = F.interpolate(s, size=T, mode="linear", align_corners=False)
        s = F.conv1d(s, sd["channel_expand.weight"],
                     sd["channel_expand.bias"])
        s = F.conv1d(s, sd["spectrogram_project.weight"],
                     sd["spectrogram_project.bias"])
        s = (torch.tanh(F.conv1d(s, sd["gtu.conv1.weight"],
                                 sd["gtu.conv1.bias"]))
             * torch.sigmoid(F.conv1d(s, sd["gtu.conv2.weight"],
                                      sd["gtu.conv2.bias"])))

        h = (F.conv1d(x, sd["input_conv.weight"], sd["input_conv.bias"])
             + step_emb + class_emb + s)
        skips = []
        for r, dil in ((1, 1), (2, 2), (3, 4), (4, 8)):
            h = F.relu(F.conv1d(h, sd[f"res_block{r}.0.weight"],
                                sd[f"res_block{r}.0.bias"]))
            h = F.conv1d(h, sd[f"res_block{r}.2.weight"],
                         sd[f"res_block{r}.2.bias"], padding=dil,
                         dilation=dil)
            h = F.conv1d(h, sd[f"res_block{r}.3.weight"],
                         sd[f"res_block{r}.3.bias"])
            h = F.group_norm(h, 1, sd[f"res_block{r}.4.weight"],
                             sd[f"res_block{r}.4.bias"], eps=1e-5)
            skips.append(h)
        h = F.conv1d(sum(skips), sd["skip_sum.weight"], sd["skip_sum.bias"])
        h = F.group_norm(h, 1, sd["layer_norm.weight"],
                         sd["layer_norm.bias"], eps=1e-5)
        h = F.relu(F.conv1d(h, sd["final_projection.0.weight"],
                            sd["final_projection.0.bias"]))
        h = F.group_norm(h, 1, sd["final_projection.2.weight"],
                         sd["final_projection.2.bias"], eps=1e-5)
        return F.conv1d(h, sd["final_projection.3.weight"],
                        sd["final_projection.3.bias"])

    return sd, torch_forward


def make_torch_diffeeg_legacy(seed: int = 0, n_channels: int = 3,
                              hidden: int = 16, n_classes: int = 6):
    """(state_dict, forward) for the reference's LEGACY DiffEEG variant
    (diffusion_model.py:8-167, dead code there): step MLP, class
    embedding, two ConvTranspose2d(k=3, s=2, p=1) spectrogram upsamplers
    + 1×1 Conv2d + flatten-add, four CHAINED conv blocks with tanh then
    sigmoid in series (no gating, no residual add), skip-sum + output
    1×1 convs.  Eval mode (dropout off)."""
    torch = __import__("torch")
    F = torch.nn.functional
    g = torch.Generator().manual_seed(seed)
    rn = lambda *s: torch.randn(*s, generator=g) * 0.3
    H, C = hidden, n_channels
    sd = {
        "class_embedding.weight": rn(n_classes, H),
        "spectrogram_upconv1.weight": rn(C, H // 2, 3, 3),
        "spectrogram_upconv1.bias": rn(H // 2),
        "spectrogram_upconv2.weight": rn(H // 2, H, 3, 3),
        "spectrogram_upconv2.bias": rn(H),
        "spectrogram_embed.weight": rn(H, H, 1, 1),
        "spectrogram_embed.bias": rn(H),
        "input_conv.weight": rn(H, C, 1), "input_conv.bias": rn(H),
        "skip_sum.weight": rn(H, H, 1), "skip_sum.bias": rn(H),
        "output_conv.weight": rn(C, H, 1), "output_conv.bias": rn(C),
    }
    for i in (0, 2, 4):
        sd[f"step_embedding_mlp.{i}.weight"] = rn(H, H)
        sd[f"step_embedding_mlp.{i}.bias"] = rn(H)
    for r, _dil in ((1, 1), (2, 2), (3, 4), (4, 8)):
        sd[f"res_block{r}.0.weight"] = rn(H, H, 1)
        sd[f"res_block{r}.0.bias"] = rn(H)
        sd[f"res_block{r}.2.weight"] = rn(H, H, 3)
        sd[f"res_block{r}.2.bias"] = rn(H)
        sd[f"res_block{r}.4.weight"] = rn(H, H, 1)
        sd[f"res_block{r}.4.bias"] = rn(H)

    import numpy as _np

    def block(x, r, dil):
        x = torch.tanh(F.conv1d(x, sd[f"res_block{r}.0.weight"],
                                sd[f"res_block{r}.0.bias"]))
        x = torch.sigmoid(F.conv1d(x, sd[f"res_block{r}.2.weight"],
                                   sd[f"res_block{r}.2.bias"],
                                   padding=dil, dilation=dil))
        return F.conv1d(x, sd[f"res_block{r}.4.weight"],
                        sd[f"res_block{r}.4.bias"])

    def torch_forward(x, y, t, spec):
        B, _, T = x.shape
        half = H // 2
        emb = torch.exp(torch.arange(half)
                        * (-_np.log(10000.0) / (half - 1)))
        emb = t.view(-1, 1) * emb
        se = torch.cat((emb.sin(), emb.cos()), dim=-1)
        se = F.relu(F.linear(se, sd["step_embedding_mlp.0.weight"],
                             sd["step_embedding_mlp.0.bias"]))
        se = F.relu(F.linear(se, sd["step_embedding_mlp.2.weight"],
                             sd["step_embedding_mlp.2.bias"]))
        se = F.linear(se, sd["step_embedding_mlp.4.weight"],
                      sd["step_embedding_mlp.4.bias"])
        step_emb = se.unsqueeze(-1).expand(-1, -1, T)
        ce = sd["class_embedding.weight"][y.argmax(dim=1)]
        class_emb = ce.unsqueeze(-1).expand(-1, -1, T)
        s = F.relu(F.conv_transpose2d(
            spec, sd["spectrogram_upconv1.weight"],
            sd["spectrogram_upconv1.bias"], stride=2, padding=1))
        s = F.relu(F.conv_transpose2d(
            s, sd["spectrogram_upconv2.weight"],
            sd["spectrogram_upconv2.bias"], stride=2, padding=1))
        s = F.conv2d(s, sd["spectrogram_embed.weight"],
                     sd["spectrogram_embed.bias"])
        s = s.reshape(B, H, -1)
        h = (F.conv1d(x, sd["input_conv.weight"], sd["input_conv.bias"])
             + step_emb + class_emb + s)
        x1 = block(h, 1, 1)
        x2 = block(x1, 2, 2)
        x3 = block(x2, 3, 4)
        x4 = block(x3, 4, 8)
        out = F.conv1d(x1 + x2 + x3 + x4, sd["skip_sum.weight"],
                       sd["skip_sum.bias"])
        return F.conv1d(out, sd["output_conv.weight"],
                        sd["output_conv.bias"])

    return sd, torch_forward

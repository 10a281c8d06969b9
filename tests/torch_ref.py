"""Fabricated reference-style torch EEGNet (models.py:239-289 layout),
built functionally so torch autograd flows through it — shared by the
logit-parity import test and the attribution-fidelity golden tests."""

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

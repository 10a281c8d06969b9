"""DeepConvNet (reference models.py:293-348): four conv-pool-dropout stages
(25→50→100→200) with VALID (1,10) temporal kernels → FC → log-softmax."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import batch_norm, flatten_nchw, log_softmax, max_pool, nchw_to_nhwc


class DeepConvNet(nn.Module):
    nb_classes: int = 6
    chans: int = 37
    samples: int = 3000
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # four VALID (1,10) conv + (1,4) pool stages: T shrinks
        # t→(t-9)//4 four times; anything shorter bottoms out at zero
        # features and dies inside flax with an opaque ZeroDivisionError
        t = x.shape[-1]
        for _ in range(4):
            t = (t - 9) // 4
        if t < 1:
            raise ValueError(
                f"DeepConvNet needs ≥1021 time samples (got {x.shape[-1]}):"
                " the four VALID conv-pool stages collapse shorter inputs "
                "to zero features")
        x = nchw_to_nhwc(x)                     # (B, Chans, T, 1)
        x = nn.Conv(25, (1, 10), padding="VALID", use_bias=False,
                    name="conv1")(x)
        x = nn.Conv(25, (self.chans, 1), padding="VALID", use_bias=False,
                    name="conv2")(x)
        x = nn.elu(batch_norm(train)(x))
        x = max_pool(x, (1, 4))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        for i, width in enumerate((50, 100, 200)):
            x = nn.Conv(width, (1, 10), padding="VALID", use_bias=False,
                        name=f"conv{i+3}")(x)
            x = nn.elu(batch_norm(train)(x))
            x = max_pool(x, (1, 4))
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        self.sow("intermediates", "feature_map", x)
        x = self.perturb("feature_map", x)
        x = flatten_nchw(x)
        x = nn.Dense(self.nb_classes, name="fc1")(x)
        return log_softmax(x)

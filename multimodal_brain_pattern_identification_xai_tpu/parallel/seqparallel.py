"""Sequence parallelism for long multi-hour EEG (BASELINE.json config #4 —
new scope vs the reference, whose sequences are ≤10k samples, SURVEY.md
§5.7).

The time axis is sharded over the ``seq`` mesh axis and computed with
``shard_map`` collectives:

* :func:`halo_conv1d` — local convolution with ``ppermute`` halo exchange
  for the receptive field (CNN front-ends are local → shard trivially);
* :func:`sequence_parallel_attention` — local queries attend to the
  ``all_gather``-ed keys/values (KV-gather sequence parallelism; exact
  attention, communication O(L·D) per device over ICI);
* :class:`LongEEGEncoder` + :func:`long_eeg_forward` — patch-embed →
  transformer → mean-pool classifier over the sharded time axis, with
  attention probabilities optionally returned for attention rollout.

All ops are exact: outputs match the single-device computation bit-for-bit
up to reduction order.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


# ---------------------------------------------------------------------------
# Halo-exchange convolution
# ---------------------------------------------------------------------------

def halo_conv1d(x_local: jnp.ndarray, kernel: jnp.ndarray,
                axis_name: str = "seq") -> jnp.ndarray:
    """'SAME' 1-D convolution over a time axis sharded on ``axis_name``.

    Runs *inside* shard_map.  ``x_local``: (B, T_local, C_in); ``kernel``:
    (K, C_in, C_out) with K odd.  Each shard pulls K//2 halo samples from
    its ring neighbors via ``ppermute`` (zero-padded at the global edges),
    then convolves VALID — equivalent to global SAME convolution.
    """
    K = kernel.shape[0]
    h = K // 2
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    right_edge = x_local[:, -h:, :]   # send → right neighbor's left halo
    left_edge = x_local[:, :h, :]     # send → left neighbor's right halo
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)])
    # zero the wrapped-around halos at the global boundaries
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right),
                           from_right)
    xp = jnp.concatenate([from_left, x_local, from_right], axis=1)
    return jax.lax.conv_general_dilated(
        xp, kernel, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))


# ---------------------------------------------------------------------------
# Sequence-parallel attention
# ---------------------------------------------------------------------------

def sequence_parallel_attention(q: jnp.ndarray, k: jnp.ndarray,
                                v: jnp.ndarray, n_heads: int,
                                axis_name: str = "seq",
                                return_weights: bool = False):
    """Exact multi-head attention with the token axis sharded.

    Runs inside shard_map.  q/k/v: (B, L_local, D).  Keys and values are
    all-gathered over ``axis_name`` (tiled), queries stay local — each
    device computes its L_local query rows against the full sequence.
    """
    B, Ll, D = q.shape
    hd = D // n_heads
    kf = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)   # (B, L, D)
    vf = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)

    def split(t):
        return t.reshape(t.shape[0], t.shape[1], n_heads, hd)

    qh, kh, vh = split(q), split(kf), split(vf)
    scores = jnp.einsum("blhd,bmhd->bhlm", qh, kh) / np.sqrt(hd)
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", weights, vh).reshape(B, Ll, D)
    if return_weights:
        return out, weights
    return out


# ---------------------------------------------------------------------------
# Long-EEG encoder (explicit-param module: shard_map-friendly)
# ---------------------------------------------------------------------------

class LongEEGEncoder:
    """Patch-embed + pre-LN transformer + mean-pool classifier over a
    sequence-sharded time axis.

    Explicit param pytree (init/apply pair) rather than a flax module so
    the whole forward lives inside one ``shard_map`` without interpreter
    overhead; params are replicated (P()), activations sharded on "seq".
    """

    def __init__(self, n_channels: int = 20, patch: int = 200,
                 d_model: int = 128, depth: int = 4, n_heads: int = 4,
                 mlp_ratio: int = 4, n_classes: int = 6):
        self.n_channels = n_channels
        self.patch = patch
        self.d_model = d_model
        self.depth = depth
        self.n_heads = n_heads
        self.mlp = d_model * mlp_ratio
        self.n_classes = n_classes

    def init(self, key: jax.Array) -> Dict[str, Any]:
        ks = iter(jax.random.split(key, 4 + 6 * self.depth))
        D, M = self.d_model, self.mlp
        lecun = jax.nn.initializers.lecun_normal()
        params: Dict[str, Any] = {
            "embed": lecun(next(ks), (self.patch * self.n_channels, D)),
            "embed_b": jnp.zeros((D,)),
            "head": lecun(next(ks), (D, self.n_classes)),
            "head_b": jnp.zeros((self.n_classes,)),
            "layers": [],
        }
        for _ in range(self.depth):
            params["layers"].append({
                "qkv": lecun(next(ks), (D, 3 * D)),
                "proj": lecun(next(ks), (D, D)),
                "ln1": (jnp.ones((D,)), jnp.zeros((D,))),
                "ln2": (jnp.ones((D,)), jnp.zeros((D,))),
                "fc1": lecun(next(ks), (D, M)),
                "fc1_b": jnp.zeros((M,)),
                "fc2": lecun(next(ks), (M, D)),
                "fc2_b": jnp.zeros((D,)),
            })
        return params

    # -- shard-local forward (runs inside shard_map) --------------------

    def _ln(self, x, scale, bias, eps=1e-6):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias

    def local_forward(self, params, x_local: jnp.ndarray,
                      axis_name: Optional[str] = "seq",
                      return_attn: bool = False):
        """x_local: (B, C, T_local) with T_local divisible by ``patch``.

        With ``return_attn=True`` also returns the per-layer attention
        weights stacked as (depth, B, H, L_local, L_full) — the input to
        attention rollout (BASELINE.json config #4).
        """
        B, Cc, Tl = x_local.shape
        tokens = x_local.reshape(B, Cc, Tl // self.patch, self.patch)
        tokens = tokens.transpose(0, 2, 3, 1).reshape(
            B, Tl // self.patch, self.patch * Cc)
        h = tokens @ params["embed"] + params["embed_b"]
        attns = []
        for lyr in params["layers"]:
            a_in = self._ln(h, *lyr["ln1"])
            qkv = a_in @ lyr["qkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if axis_name is not None:
                a, w = sequence_parallel_attention(q, k, v, self.n_heads,
                                                   axis_name,
                                                   return_weights=True)
            else:
                a, w = _local_attention(q, k, v, self.n_heads,
                                        return_weights=True)
            attns.append(w)
            h = h + a @ lyr["proj"]
            m_in = self._ln(h, *lyr["ln2"])
            m = jax.nn.gelu(m_in @ lyr["fc1"] + lyr["fc1_b"])
            h = h + m @ lyr["fc2"] + lyr["fc2_b"]
        # global mean pool over the sharded token axis
        local_sum = h.sum(axis=1)
        if axis_name is not None:
            total = jax.lax.psum(local_sum, axis_name)
            count = jax.lax.psum(jnp.asarray(h.shape[1], h.dtype), axis_name)
        else:
            total, count = local_sum, jnp.asarray(h.shape[1], h.dtype)
        pooled = total / count
        logits = pooled @ params["head"] + params["head_b"]
        if return_attn:
            return logits, jnp.stack(attns)
        return logits


def _local_attention(q, k, v, n_heads, return_weights: bool = False):
    B, L, D = q.shape
    hd = D // n_heads
    qh = q.reshape(B, L, n_heads, hd)
    kh = k.reshape(B, L, n_heads, hd)
    vh = v.reshape(B, L, n_heads, hd)
    s = jnp.einsum("blhd,bmhd->bhlm", qh, kh) / np.sqrt(hd)
    w = jax.nn.softmax(s, -1)
    out = jnp.einsum("bhlm,bmhd->blhd", w, vh).reshape(B, L, D)
    if return_weights:
        return out, w
    return out


def long_eeg_forward(encoder: LongEEGEncoder, params, x: jnp.ndarray,
                     mesh: Mesh) -> jnp.ndarray:
    """Sequence-parallel forward: x (B, C, T) sharded on 'seq' along T."""
    fn = shard_map(
        functools.partial(encoder.local_forward, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(), P(None, None, "seq")),
        out_specs=P(),
        check_vma=False,
    )
    return fn(params, x)


def long_eeg_rollout(encoder: LongEEGEncoder, params, x: jnp.ndarray,
                     mesh: Mesh):
    """Sequence-parallel forward + attention rollout over the full token
    axis (config #4: long-EEG transformer with attention-rollout
    attribution).  Returns (logits, rollout (B, L, L))."""
    fn = shard_map(
        functools.partial(encoder.local_forward, axis_name="seq",
                          return_attn=True),
        mesh=mesh,
        in_specs=(P(), P(None, None, "seq")),
        # attention weights: (depth, B, H, L_local, L) — queries sharded
        out_specs=(P(), P(None, None, None, "seq", None)),
        check_vma=False,
    )
    logits, attn = fn(params, x)
    from ..xai.rollout import attention_rollout
    return logits, attention_rollout(list(attn))

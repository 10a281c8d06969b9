"""Exactness tests for the fused phase-packed spec-block kernel
(``ops/pallas_specblock.py``) vs an XLA ground truth of the reference
chain conv3x3+bias+ReLU ×3 → 2×2 pool (models.py:60-77), in Pallas
interpret mode on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_brain_pattern_identification_xai_tpu.ops.pallas_specblock import (
    fused_specblock_convpool, fused_specblock_convpool_vjp,
    pack_conv_weights)


def _ref_chain(x, kernels, biases, pool):
    for k, b in zip(kernels, biases):
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        x = jnp.maximum(x, 0.0)
    init = -jnp.inf if pool == "max" else 0.0
    op = jax.lax.max if pool == "max" else jax.lax.add
    red = jax.lax.reduce_window(x, init, op, (1, 2, 2, 1), (1, 2, 2, 1),
                                "VALID")
    return red if pool == "max" else red / 4.0


def _params(rng, cin, cout, dtype=np.float32):
    kernels = [jnp.asarray(rng.standard_normal((3, 3, ci, cout)) * 0.2,
                           dtype)
               for ci in (cin, cout, cout)]
    biases = [jnp.asarray(rng.standard_normal(cout) * 0.1, dtype)
              for _ in range(3)]
    return kernels, biases


@pytest.mark.parametrize("pack_w,pool,cin,cout,h,w,hb", [
    (4, "max", 3, 16, 16, 24, 2),     # block1 shape family, 4 strips
    (4, "max", 3, 16, 12, 16, 3),     # single pad-col block col count
    (2, "avg", 16, 8, 16, 12, 4),     # block2 shape family, 2 strips
    (2, "max", 5, 8, 8, 8, 2),        # odd cin, minimal dims
    (4, "avg", 3, 8, 8, 16, 4),       # one strip (s == 0 == S-1)
    (4, "max", 3, 8, 8, 20, 2),       # W % (2·pack_w) ≠ 0 (like W=300)
])
def test_fused_matches_xla_f32(pack_w, pool, cin, cout, h, w, hb):
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
    kernels, biases = _params(rng, cin, cout)
    want = _ref_chain(x, kernels, biases, pool)
    got = fused_specblock_convpool(
        x, kernels, biases, pool=pool, pack_w=pack_w, strip_rows=hb,
        dtype=jnp.float32, interpret=True)
    assert got.shape == want.shape == (2, h // 2, w // 2, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_bf16_close_to_f32_truth():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 3)), jnp.float32)
    kernels, biases = _params(rng, 3, 16)
    want = np.asarray(_ref_chain(x, kernels, biases, "max"))
    got = np.asarray(fused_specblock_convpool(
        x, kernels, biases, pool="max", pack_w=4, strip_rows=4,
        dtype=jnp.bfloat16, interpret=True)).astype(np.float32)
    # bf16 storage + f32 accumulation: compare at tensor scale (elementwise
    # relative error is unbounded at ReLU thresholds where bf16 rounding
    # flips the pre-activation sign)
    scale = float(np.abs(want).max())
    err = np.abs(got - want) / scale
    assert float(err.max()) < 0.03, float(err.max())
    assert float(err.mean()) < 0.003, float(err.mean())


def test_pack_conv_weights_density_and_values():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 8)), jnp.float32)
    wp = pack_conv_weights(k, 4)
    assert wp.shape == (2 * 4 * 8, 4 * 6 * 4)
    nz = np.count_nonzero(np.asarray(wp))
    assert nz == 8 * 8 * 9 * 4                       # 9/24 density exactly
    # phase (0,0), tap (u=1,v=1) ↔ kernel center-less… ky=1,kx=1 → K3[1,1].T
    blk = np.asarray(wp[:8, (1 * 6 + 1) * 4:(1 * 6 + 2) * 4])
    np.testing.assert_array_equal(blk, np.asarray(k[1, 1]).T)


def test_fused_vjp_gradients_match_xla_chain():
    """The custom-VJP wrapper's gradients (w.r.t. input, kernels, biases)
    equal the gradients of the unfused XLA chain in f32."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 3)), jnp.float32)
    kernels, biases = _params(rng, 3, 8)

    def loss_fused(x, ks, bs):
        out = fused_specblock_convpool_vjp(
            x, ks, bs, pool="avg", pack_w=4, strip_rows=2,
            dtype=jnp.float32, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(x, ks, bs):
        return jnp.sum(_ref_chain(x, list(ks), list(bs), "avg") ** 2)

    args = (x, tuple(kernels), tuple(biases))
    got = jax.grad(loss_fused, argnums=(0, 1, 2))(*args)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_fused_model_input_gradient_matches_unfused():
    """Saliency-style input gradients flow through a fused-serving
    SpectrogramCNN and match the unfused model (f32)."""
    from multimodal_brain_pattern_identification_xai_tpu.models import (
        SpectrogramCNN)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 64)), jnp.float32)
    base = SpectrogramCNN()
    variables = base.init(jax.random.PRNGKey(0), x[:1])
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    fused = SpectrogramCNN(fused_blocks=2)

    def sal(model):
        return jax.grad(lambda xi: model.apply(variables, xi)[:, 1].sum())(x)

    np.testing.assert_allclose(np.asarray(sal(fused)),
                               np.asarray(sal(base)),
                               rtol=2e-4, atol=2e-4)


def test_speccnn_fused_blocks_matches_unfused():
    """SpectrogramCNN(fused_blocks=2) is checkpoint-interchangeable with
    the unfused model and produces the same log-probs (f32)."""
    import flax.linen  # noqa: F401  (import check)
    from multimodal_brain_pattern_identification_xai_tpu.models import (
        SpectrogramCNN)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 3, 64, 64)), jnp.float32)
    base = SpectrogramCNN()
    variables = base.init(jax.random.PRNGKey(0), x[:1])
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    want = base.apply(variables, x)
    fused = SpectrogramCNN(fused_blocks=2)
    got = fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

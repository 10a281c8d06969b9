"""Tests for the auxiliary components: kaiming init, checkpoint analysis,
SHAP plots, torch-ViT weight import, dp-tp-sp dry-run step, long-EEG
rollout."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

import multimodal_brain_pattern_identification_xai_tpu.config as C
from multimodal_brain_pattern_identification_xai_tpu import (models, parallel,
                                                             train, xai)
from multimodal_brain_pattern_identification_xai_tpu.parallel import dryrun


def test_kaiming_init(rng):
    model = models.EEGNet(samples=128, kern_length=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 37, 128)))
    p2 = train.initialize_kaiming_weights(v["params"], jax.random.PRNGKey(1))
    k = p2["stem"]["conv1"]["kernel"]
    assert k.shape == v["params"]["stem"]["conv1"]["kernel"].shape
    assert not np.allclose(np.asarray(k),
                           np.asarray(v["params"]["stem"]["conv1"]["kernel"]))
    # model still runs with re-initialized weights
    out = model.apply({"params": p2, "batch_stats": v["batch_stats"]},
                      jnp.zeros((2, 1, 37, 128)))
    assert np.isfinite(np.asarray(out)).all()


def test_analyze_checkpoints(tmp_path):
    for name, kld in (("best-kldiv", 0.5), ("step_100", 0.9), ("last", 0.7)):
        with open(tmp_path / f"{name}.json", "w") as f:
            json.dump({"kldiv": kld, "epoch": 1}, f)
    best, records = train.analyze_checkpoints(str(tmp_path))
    assert best["name"] == "best-kldiv"
    assert len(records) == 3


def test_shap_plots_render(tmp_path, rng):
    sv = rng.standard_normal((6, 3, 1, 37, 40))
    names = xai.channel_select.channel_names_37()
    p1 = xai.plot_mean_shap_values(sv, names, str(tmp_path), list(C.CLASSES))
    p2 = xai.plot_mean_shap_values_scatter(sv, names, str(tmp_path))
    p3 = xai.plot_shap_summary(sv[0], rng.standard_normal((3, 1, 37, 40)),
                               names, str(tmp_path))
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_torch_vit_import(rng):
    """Round-trip a fabricated torchvision-style state dict through the
    converter and check the model still runs with the imported weights."""
    torch = __import__("torch")
    model = models.SpectrogramViT(image_size=(64, 48), dim=32, depth=2,
                                  n_heads=4, mlp_dim=64)
    x = jnp.zeros((1, 3, 64, 48))
    variables = model.init(jax.random.PRNGKey(0), x)

    D, depth, mlp = 32, 2, 64
    sd = {
        "conv_proj.weight": torch.randn(D, 3, 16, 16),
        "conv_proj.bias": torch.randn(D),
        "class_token": torch.randn(1, 1, D),
        "encoder.ln.weight": torch.randn(D),
        "encoder.ln.bias": torch.randn(D),
    }
    for i in range(depth):
        pre = f"encoder.layers.encoder_layer_{i}"
        sd.update({
            f"{pre}.ln_1.weight": torch.randn(D),
            f"{pre}.ln_1.bias": torch.randn(D),
            f"{pre}.ln_2.weight": torch.randn(D),
            f"{pre}.ln_2.bias": torch.randn(D),
            f"{pre}.self_attention.in_proj_weight": torch.randn(3 * D, D),
            f"{pre}.self_attention.in_proj_bias": torch.randn(3 * D),
            f"{pre}.self_attention.out_proj.weight": torch.randn(D, D),
            f"{pre}.self_attention.out_proj.bias": torch.randn(D),
            f"{pre}.mlp.0.weight": torch.randn(mlp, D),
            f"{pre}.mlp.0.bias": torch.randn(mlp),
            f"{pre}.mlp.3.weight": torch.randn(D, mlp),
            f"{pre}.mlp.3.bias": torch.randn(D),
        })
    p2 = models.load_torch_vit_state_dict(sd, variables["params"], depth=2)
    np.testing.assert_allclose(
        np.asarray(p2["conv_proj"]["kernel"]),
        sd["conv_proj.weight"].numpy().transpose(2, 3, 1, 0))
    out = model.apply({"params": p2}, jnp.asarray(
        rng.standard_normal((2, 3, 64, 48)), jnp.float32))
    assert out.shape == (2, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_dp_tp_sp_train_step_runs_and_learns(rng):
    mesh = parallel.make_mesh(C.MeshConfig(data=2, model=2, seq=2))
    enc = parallel.LongEEGEncoder(n_channels=4, patch=8, d_model=16,
                                  depth=1, n_heads=2)
    params = dryrun.init_dp_tp_sp_params(jax.random.PRNGKey(0), enc,
                                         head_hidden=32)
    B, T = 4, 8 * 8 * 2
    x = rng.standard_normal((B, 4, T)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, B)]
    params, xs, ys = dryrun.place_inputs(mesh, params, x, y)
    step = dryrun.make_dp_tp_sp_train_step(mesh, enc, lr=5e-2)
    losses = []
    for _ in range(8):
        params, loss = step(params, xs, ys)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_dp_tp_sp_grads_match_single_device(rng):
    """One DP×TP×SP step == the unsharded computation (collective
    correctness across all three axes)."""
    mesh = parallel.make_mesh(C.MeshConfig(data=2, model=2, seq=2))
    enc = parallel.LongEEGEncoder(n_channels=2, patch=4, d_model=8,
                                  depth=1, n_heads=2)
    params0 = dryrun.init_dp_tp_sp_params(jax.random.PRNGKey(0), enc,
                                          head_hidden=16)
    B, T = 4, 4 * 4 * 2
    x = rng.standard_normal((B, 2, T)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, B)]

    # single-device reference step
    import jax.numpy as jnp
    from multimodal_brain_pattern_identification_xai_tpu.parallel import tp

    def ref_loss(p):
        pooled = enc.local_forward(p["enc"], jnp.asarray(x), axis_name=None)
        h = jax.nn.relu(pooled @ p["k1"] + p["b1"])
        logits = h @ p["k2"] + p["b2"]
        logp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.sum(jnp.asarray(y) * logp, -1)) * B / B

    lr = 1e-2
    ref_grads = jax.grad(ref_loss)(params0)
    ref_new = jax.tree_util.tree_map(lambda p, g: p - lr * g, params0,
                                     ref_grads)

    params, xs, ys = dryrun.place_inputs(mesh, params0, x, y)
    step = dryrun.make_dp_tp_sp_train_step(mesh, enc, lr=lr)
    new_params, loss = step(params, xs, ys)
    assert abs(float(loss) - float(ref_loss(params0))) < 1e-5
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_new),
            jax.tree_util.tree_leaves_with_path(new_params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4,
                                   atol=2e-5,
                                   err_msg=jax.tree_util.keystr(pa))


def test_long_eeg_rollout(rng):
    mesh = parallel.make_mesh(C.MeshConfig(data=1, model=1, seq=8))
    enc = parallel.LongEEGEncoder(n_channels=2, patch=4, d_model=16,
                                  depth=2, n_heads=2)
    params = enc.init(jax.random.PRNGKey(0))
    x = rng.standard_normal((2, 2, 4 * 8 * 8)).astype(np.float32)
    logits, roll = parallel.long_eeg_rollout(enc, params, jnp.asarray(x),
                                             mesh)
    L = x.shape[-1] // 4
    assert logits.shape == (2, 6)
    assert roll.shape == (2, L, L)
    np.testing.assert_allclose(np.asarray(roll.sum(-1)), 1.0, atol=1e-4)


def test_sharded_attributions_match_single_device(rng):
    mesh = parallel.make_mesh(C.MeshConfig(data=8, model=1, seq=1))
    model = models.SpectrogramCNN()
    x = jnp.asarray(rng.standard_normal((8, 3, 32, 32)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x[:2])
    variables = {"params": v["params"], "batch_stats": v["batch_stats"]}
    fwd = lambda xx: model.apply(variables, xx)
    tgt = jnp.argmax(fwd(x), -1)

    ref = xai.integrated_gradients(fwd, x, None, tgt, steps=16)
    got = xai.sharded_integrated_gradients(mesh, fwd, x, None, tgt, steps=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)

    bg = jnp.asarray(rng.standard_normal((4, 3, 32, 32)), jnp.float32)
    key = jax.random.PRNGKey(1)
    ref_eg = xai.expected_gradients(fwd, x, bg, key, tgt, nsamples=4)
    got_eg = xai.sharded_expected_gradients(mesh, fwd, x, bg, key, tgt,
                                            nsamples=4)
    np.testing.assert_allclose(np.asarray(got_eg), np.asarray(ref_eg),
                               rtol=1e-4, atol=1e-6)


def test_trainer_epoch_callbacks(tmp_path, rng):
    from multimodal_brain_pattern_identification_xai_tpu import train as T
    model = models.EEGNet(samples=128, kern_length=8)
    x = jnp.asarray(rng.standard_normal((4, 1, 37, 128)), jnp.float32)
    y = jnp.asarray(np.eye(6, dtype=np.float32)[rng.integers(0, 6, 4)])
    tx = T.state.make_optimizer(1e-3)
    state = T.create_train_state(model, (x,), tx, jax.random.PRNGKey(0))
    calls = []
    trainer = T.Trainer(state, T.TrainerConfig(epochs=2,
                                               eval_metrics=("kldiv",)),
                        epoch_callbacks=[
                            lambda tr, ep, res: calls.append((ep, res))])
    batch = {"x": np.asarray(x), "y": np.asarray(y)}
    trainer.train_eval(lambda: iter([batch]), lambda: iter([batch]))
    assert [c[0] for c in calls] == [0, 1]
    assert "kldiv" in calls[0][1]

"""Training-layer tests: losses vs torch semantics, metrics vs sklearn,
schedules vs reference math, jitted step + trainer loop smoke, checkpoint
roundtrip, determinism (SURVEY.md §4, §5.2)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from multimodal_brain_pattern_identification_xai_tpu import models, train


def _soft_targets(rng, n, c=6):
    t = rng.random((n, c)).astype(np.float32)
    return t / t.sum(1, keepdims=True)


def test_kldiv_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    logits = rng.standard_normal((8, 6)).astype(np.float32)
    targets = _soft_targets(rng, 8)
    got = float(train.kldiv_with_logits(jnp.asarray(logits),
                                        jnp.asarray(targets)))
    tl = torch.tensor(logits)
    tt = torch.tensor(targets)
    ref = torch.nn.KLDivLoss(reduction="batchmean")(
        F.log_softmax(tl, dim=1), tt).item()
    assert abs(got - ref) < 1e-5


def test_kldiv_idempotent_on_log_probs(rng):
    logits = rng.standard_normal((8, 6)).astype(np.float32)
    targets = _soft_targets(rng, 8)
    logp = jax.nn.log_softmax(jnp.asarray(logits))
    a = float(train.kldiv_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    b = float(train.kldiv_with_logits(logp, jnp.asarray(targets)))
    assert abs(a - b) < 1e-5


def test_macro_prf_matches_sklearn(rng):
    from sklearn.metrics import precision_recall_fscore_support
    y_true = rng.integers(0, 6, 200)
    y_pred = rng.integers(0, 6, 200)
    p, r, f = train.macro_precision_recall_f1(
        jnp.asarray(y_pred), jnp.asarray(y_true), 6)
    pr, rr, fr, _ = precision_recall_fscore_support(
        y_true, y_pred, average="macro", zero_division=0)
    assert abs(float(p) - pr) < 1e-5
    assert abs(float(r) - rr) < 1e-5
    assert abs(float(f) - fr) < 1e-4


def test_confusion_matrix(rng):
    y_true = np.array([0, 0, 1, 2])
    y_pred = np.array([0, 1, 1, 2])
    cm = np.asarray(train.confusion_matrix(jnp.asarray(y_pred),
                                           jnp.asarray(y_true), 3))
    assert cm[0, 0] == 1 and cm[0, 1] == 1 and cm[1, 1] == 1 and cm[2, 2] == 1
    assert cm.sum() == 4


def test_warmup_cosine_schedule_matches_reference_math():
    import math
    fn = train.warmup_cosine_schedule(5, 50, 1e-4, 1e-3, 1e-5)
    for epoch in [0, 2, 4, 5, 20, 49]:
        if epoch < 5:
            ref = 1e-4 + (1e-3 - 1e-4) * (epoch + 1) / 5
        else:
            progress = (epoch - 5) / 45
            ref = 1e-5 + (1e-3 - 1e-5) * 0.5 * (1 + math.cos(math.pi * progress))
        assert abs(float(fn(epoch)) - ref) < 1e-9


def test_reduce_lr_on_plateau():
    sched = train.ReduceLROnPlateau(1.0, factor=0.5, patience=1)
    assert sched.step(1.0) == 1.0          # first improves vs inf
    assert sched.step(1.0) == 1.0          # bad 1
    assert sched.step(1.0) == 0.5          # bad 2 > patience → decay
    assert sched.step(0.5) == 0.5          # improvement resets


def _tiny_setup(rng):
    model = models.EEGNet(samples=128, kern_length=8)
    x = jnp.asarray(rng.standard_normal((4, 1, 37, 128)), jnp.float32)
    y = jnp.asarray(_soft_targets(rng, 4))
    tx = train.state.make_optimizer(1e-3)
    state = train.create_train_state(model, (x,), tx, jax.random.PRNGKey(0))
    return model, state, {"x": x, "y": y}


@pytest.mark.slow
def test_train_step_reduces_loss(rng):
    _, state, batch = _tiny_setup(rng)
    step = train.make_train_step()
    key = jax.random.PRNGKey(1)
    _, m0 = step(state, batch, key)
    for _ in range(30):
        state, m = step(state, batch, key)
    assert float(m["loss"]) < float(m0["loss"])
    assert np.isfinite(float(m["grad_norm"]))


def test_train_step_bf16_activations_learns(rng):
    """Mixed-precision training (bf16 activations on the spectrogram CNN,
    f32 params/BN-stats/optimizer — the TPU analogue of the reference's
    AMP autocast, training_utils.py:635-682): the loss still goes down and
    params/opt state stay f32."""
    import jax.numpy as jnp
    import optax
    from multimodal_brain_pattern_identification_xai_tpu import models

    model = models.SpectrogramCNN(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((8, 3, 64, 48)), jnp.float32)
    y = jnp.asarray(np.eye(6, dtype=np.float32)[rng.integers(0, 6, 8)])
    state = train.create_train_state(model, (x,), optax.adam(1e-3),
                                     jax.random.PRNGKey(0))
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(state.params))
    step = train.make_train_step()
    batch = {"x": x, "y": y}
    key = jax.random.PRNGKey(1)
    _, m0 = step(state, batch, key)
    for _ in range(25):
        state, m = step(state, batch, key)
    assert float(m["loss"]) < float(m0["loss"])
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(state.params))


@pytest.mark.slow
def test_determinism_same_key_same_logits(rng):
    """Same PRNG key ⇒ bitwise-identical training trajectory (§5.2)."""
    def run():
        r = np.random.default_rng(7)
        _, state, batch = _tiny_setup(r)
        step = train.make_train_step()
        for _ in range(3):
            state, m = step(state, batch, jax.random.PRNGKey(3))
        ev = train.make_eval_step()
        logits, _ = ev(state, batch)
        return np.asarray(logits)
    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_trainer_loop_and_checkpoint(tmp_path, rng):
    model, state, batch = _tiny_setup(rng)
    cfg = train.TrainerConfig(epochs=3, eval_metrics=("kldiv", "accuracy"),
                              lr_schedule=train.warmup_cosine_schedule(
                                  1, 3, 1e-4, 1e-3, 1e-5),
                              step_per_batch=False)
    trainer = train.Trainer(state, cfg, ckpt_dir=str(tmp_path / "ckpt"))
    batches = [
        {k: np.asarray(v) for k, v in batch.items()} for _ in range(2)]
    final_state, best, oof = trainer.train_eval(
        lambda: iter(batches), lambda: iter(batches))
    assert np.isfinite(best)
    assert oof is not None and oof.shape == (8, 6)
    assert trainer.ckpt.best_epoch >= 0
    # roundtrip: restore best into a fresh state
    restored = trainer.ckpt.load_best(jax.tree_util.tree_map(
        np.asarray, final_state))
    la = jax.tree_util.tree_leaves(restored.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in la)


@pytest.mark.slow
def test_grid_search_vmapped(rng):
    model = models.DilatedInceptionWaveNet(block_layers=(2,), block_dims=(8,))
    x = jnp.asarray(rng.standard_normal((4, 64, 8)), jnp.float32)
    y = jnp.asarray(_soft_targets(rng, 4))
    batches = [{"x": np.asarray(x), "y": np.asarray(y)}]
    best, results = train.parallel_grid_search(
        model, (x,), lambda: iter(batches),
        {"lr": [1e-3, 1e-2]}, train.kldiv_with_logits, epochs=2)
    assert len(results) == 2
    assert {"lr", "loss"} <= set(best)


def test_cv_splitters(rng):
    labels = rng.integers(0, 6, 120)
    groups = rng.integers(0, 17, 120)
    for tr, va in train.stratified_kfold(labels, 5):
        assert len(np.intersect1d(tr, va)) == 0
        assert len(tr) + len(va) == 120
    for tr, va in train.group_kfold(groups, 5):
        assert len(np.intersect1d(np.unique(groups[tr]),
                                  np.unique(groups[va]))) == 0
    votes = np.array([[2, 0, 0, 0, 0, 2], [0, 0, 0, 0, 0, 5]])
    t = train.cv.aggregate_vote_labels(votes)
    np.testing.assert_allclose(t.sum(1), 1.0)
    np.testing.assert_allclose(t[0, 0], 0.5)


def test_nan_sentinel_skips_bad_update(rng):
    """Non-finite batch → loss is NaN but params stay finite & unchanged
    (SURVEY.md §5.3: in-jit NaN sentinels)."""
    _, state, batch = _tiny_setup(rng)
    step = train.make_train_step()
    bad = dict(batch)
    bad["x"] = jnp.asarray(np.full_like(np.asarray(batch["x"]), np.nan))
    before = jax.tree_util.tree_leaves(state.params)
    state2, m = step(state, bad, jax.random.PRNGKey(0))
    assert bool(m["nonfinite"])
    after = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(after, before):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a good batch afterwards still works
    state3, m2 = step(state2, batch, jax.random.PRNGKey(0))
    assert not bool(m2["nonfinite"])
    assert np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_trainer_resume_matches_uninterrupted(tmp_path):
    """Train 2 epochs, 'kill' the process, resume to 4 → bitwise the same
    params/history/OOF as an uninterrupted 4-epoch run (the reference's
    epoch-tarball resume, data_utils.py:256-311)."""
    def make(dir_, epochs, resume=False):
        r = np.random.default_rng(5)
        _, state, batch = _tiny_setup(r)
        cfg = train.TrainerConfig(epochs=epochs, resume=resume,
                                  eval_metrics=("kldiv",))
        batches = [{k: np.asarray(v) for k, v in batch.items()}
                   for _ in range(2)]
        return train.Trainer(state, cfg, ckpt_dir=dir_), batches

    tr_a, ba = make(str(tmp_path / "a"), 4)
    state_a, best_a, oof_a = tr_a.train_eval(lambda: iter(ba),
                                             lambda: iter(ba))
    tr_b1, bb = make(str(tmp_path / "b"), 2)
    tr_b1.train_eval(lambda: iter(bb), lambda: iter(bb))
    # fresh-process equivalent: brand-new trainer over the same ckpt dir
    tr_b2, bb2 = make(str(tmp_path / "b"), 4, resume=True)
    state_b, best_b, oof_b = tr_b2.train_eval(lambda: iter(bb2),
                                              lambda: iter(bb2))
    assert tr_b2.history["train_loss"] == pytest.approx(
        tr_a.history["train_loss"])
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert best_b == pytest.approx(best_a)
    np.testing.assert_array_equal(oof_a, oof_b)


def test_trainer_passes_epoch_to_loader(tmp_path, rng):
    """Epoch-aware train-loader factories receive the ACTUAL epoch number
    — in particular a resumed run's first call gets the resumed epoch, so
    epoch-keyed shuffle/augmentation seeds continue where the interrupted
    run stopped instead of restarting from zero (the CLI data factories
    rely on this)."""
    _, state, batch = _tiny_setup(rng)
    batch = {k: np.asarray(v) for k, v in batch.items()}
    seen = []

    def make(resume):
        cfg = train.TrainerConfig(epochs=4 if resume else 2, resume=resume,
                                  eval_metrics=("kldiv",))
        return train.Trainer(state, cfg, ckpt_dir=str(tmp_path / "ck"))

    def tl(epoch=0):
        seen.append(epoch)
        return iter([batch])

    make(False).train_eval(tl, lambda: iter([batch]))
    assert seen == [0, 1]
    make(True).train_eval(tl, lambda: iter([batch]))
    assert seen == [0, 1, 2, 3]          # resumed run starts at epoch 2

    # zero-arg factories keep working (no epoch passed)
    calls = []
    tr = train.Trainer(state, train.TrainerConfig(
        epochs=1, eval_metrics=("kldiv",)))
    tr.train_eval(lambda: calls.append(1) or iter([batch]),
                  lambda: iter([batch]))
    assert calls == [1]


def test_diffeeg_factory_receives_start_offset(rng):
    """DiffEEGTrainer.train hands start-aware batch factories the number
    of micro-batches already consumed (resumed_step × K) so the data
    stream fast-forwards instead of replaying from zero."""
    from multimodal_brain_pattern_identification_xai_tpu import config as C
    from multimodal_brain_pattern_identification_xai_tpu.models import DiffEEG

    cfg = C.DiffEEGConfig(n_channels=4, input_length=128, hidden_channels=8,
                          n_diffusion_steps=8, gradient_accumulate_every=3,
                          batch_size=2, evaluate_every=100,
                          save_and_sample_every=100, min_steps=1,
                          stft_n_fft=32, stft_noverlap=16)
    tr = train.DiffEEGTrainer(DiffEEG(n_channels=4, hidden=8), cfg,
                              ckpt_dir=None, seed=0)
    # simulate a resumed trainer at step 5
    tr.state = tr.state.replace(step=jnp.asarray(5))
    starts = []

    def factory(start=0):
        starts.append(start)
        while True:
            yield (rng.standard_normal((2, 4, 128)).astype(np.float32),
                   np.eye(6, dtype=np.float32)[rng.integers(0, 6, 2)])

    tr.train(factory, total_steps=6)
    assert starts == [5 * 3]


def test_ckpt_diverts_on_hyperparam_change(tmp_path, rng):
    """Hyperparameter-change guard (reference detect_and_save_checkpoint,
    data_utils.py:291-311): a trainer pointed at an existing checkpoint
    stream with a different l2_lambda/optimizer fingerprint gets a fresh
    suffixed directory instead of resuming incompatible state; the same
    fingerprint keeps the original stream."""
    _, state, batch = _tiny_setup(rng)
    d = str(tmp_path / "ck")
    mk = lambda lam, opt: train.Trainer(
        state, train.TrainerConfig(epochs=1, l2_lambda=lam,
                                   hyperparams={"optimizer": opt}),
        ckpt_dir=d)
    a = mk(0.0, "adam")
    assert a.ckpt.ckpt_dir == os.path.abspath(d)
    # same fingerprint → same stream
    assert mk(0.0, "adam").ckpt.ckpt_dir == os.path.abspath(d)
    b = mk(1e-3, "adam")
    assert b.ckpt.ckpt_dir.startswith(os.path.abspath(d) + "_l2_lambda-")
    c = mk(1e-3, "sgd")
    assert c.ckpt.ckpt_dir.startswith(
        os.path.abspath(d) + "_l2_lambda_optimizer-")
    # the diverted stream records ITS fingerprint: reusing it is stable
    assert mk(1e-3, "adam").ckpt.ckpt_dir == b.ckpt.ckpt_dir
    # same changed KEY but a different VALUE must get its own stream —
    # two different-λ runs must never share (and clobber) one directory
    b2 = mk(2e-3, "adam")
    assert b2.ckpt.ckpt_dir != b.ckpt.ckpt_dir
    assert mk(2e-3, "adam").ckpt.ckpt_dir == b2.ckpt.ckpt_dir


@pytest.mark.slow
def test_diffeeg_trainer_resume_matches_uninterrupted(tmp_path):
    """DiffEEG step-checkpoint resume (DiffEEG_train.py:87-103): interrupt
    at step 4, reload (optimizer + EMA + step + PRNG key), continue to 6 →
    same trajectory as an uninterrupted 6-step run."""
    from multimodal_brain_pattern_identification_xai_tpu import config as C

    cfg = C.DiffEEGConfig(n_channels=2, input_length=64, hidden_channels=4,
                          n_diffusion_steps=8, gradient_accumulate_every=2,
                          batch_size=2, evaluate_every=1000,
                          save_and_sample_every=2, min_steps=6,
                          stft_n_fft=16, stft_noverlap=8)

    def factory():
        r = np.random.default_rng(3)
        items = [(r.standard_normal((2, 2, 64)).astype(np.float32),
                  np.eye(6, dtype=np.float32)[r.integers(0, 6, 2)])
                 for _ in range(4)]
        return lambda: iter(items)

    def trainer(dir_):
        return train.DiffEEGTrainer(models.DiffEEG(n_channels=2, hidden=4),
                                    cfg, ckpt_dir=dir_, seed=9)

    t_a = trainer(str(tmp_path / "a"))
    t_a.train(factory(), total_steps=6)
    t_b = trainer(str(tmp_path / "b"))
    t_b.train(factory(), total_steps=4)
    t_b2 = trainer(str(tmp_path / "b"))
    assert t_b2.load() == 4
    t_b2.train(factory(), total_steps=6)
    for la, lb in zip(jax.tree_util.tree_leaves(t_a.state.params),
                      jax.tree_util.tree_leaves(t_b2.state.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for la, lb in zip(jax.tree_util.tree_leaves(t_a.ema.params),
                      jax.tree_util.tree_leaves(t_b2.ema.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert int(t_b2.state.step) == 6


@pytest.mark.slow
def test_trainer_resume_restores_plateau_state(tmp_path):
    """ReduceLROnPlateau is host-side mutable state: a resumed run must
    continue with the decayed LR/bookkeeping, not reset to the initial
    LR (post-review fix)."""
    def make(dir_, epochs, resume=False):
        r = np.random.default_rng(5)
        _, state, batch = _tiny_setup(r)
        cfg = train.TrainerConfig(
            epochs=epochs, resume=resume, eval_metrics=("kldiv",),
            plateau=train.ReduceLROnPlateau(1e-3, factor=0.5, patience=0,
                                            threshold=0.999))
        batches = [{k: np.asarray(v) for k, v in batch.items()}
                   for _ in range(2)]
        return train.Trainer(state, cfg, ckpt_dir=dir_), batches

    # threshold≈1 makes nearly every epoch "bad" → the LR decays fast
    tr_a, ba = make(str(tmp_path / "a"), 4)
    state_a, _, _ = tr_a.train_eval(lambda: iter(ba), lambda: iter(ba))
    tr_b1, bb = make(str(tmp_path / "b"), 2)
    tr_b1.train_eval(lambda: iter(bb), lambda: iter(bb))
    assert tr_b1.cfg.plateau.lr < 1e-3          # decay actually happened
    tr_b2, bb2 = make(str(tmp_path / "b"), 4, resume=True)
    state_b, _, _ = tr_b2.train_eval(lambda: iter(bb2), lambda: iter(bb2))
    assert tr_b2.cfg.plateau.lr == pytest.approx(tr_a.cfg.plateau.lr)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_diffeeg_train_already_finished_is_noop(tmp_path):
    """Resuming a completed DiffEEG run trains zero steps and returns an
    empty history instead of crashing (post-review fix)."""
    from multimodal_brain_pattern_identification_xai_tpu import config as C

    cfg = C.DiffEEGConfig(n_channels=2, input_length=64, hidden_channels=4,
                          n_diffusion_steps=6, gradient_accumulate_every=1,
                          batch_size=2, evaluate_every=1000,
                          save_and_sample_every=2, min_steps=2,
                          stft_n_fft=16, stft_noverlap=8)
    r = np.random.default_rng(0)
    items = [(r.standard_normal((2, 2, 64)).astype(np.float32),
              np.eye(6, dtype=np.float32)[np.array([0, 1])])]
    tr = train.DiffEEGTrainer(models.DiffEEG(n_channels=2, hidden=4), cfg,
                              ckpt_dir=str(tmp_path), seed=0)
    tr.train(lambda: iter(list(items)), total_steps=2)
    tr2 = train.DiffEEGTrainer(models.DiffEEG(n_channels=2, hidden=4), cfg,
                               ckpt_dir=str(tmp_path), seed=0)
    assert tr2.load() == 2
    hist = tr2.train(lambda: iter(list(items)), total_steps=2)
    assert hist["loss"] == []
    assert int(tr2.state.step) == 2


def test_trainer_epoch_reports_skipped_nonfinite_batches(caplog):
    """An epoch containing a NaN batch reports the mean of the APPLIED
    steps (not NaN) and logs the sentinel skip (SURVEY §5.3)."""
    import logging as _logging
    model = models.EEGNet(samples=64, kern_length=8)
    rng_np = np.random.default_rng(0)
    x = rng_np.standard_normal((8, 1, 37, 64)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng_np.integers(0, 6, 8)]
    state = train.create_train_state(model, (jnp.asarray(x[:2]),),
                                     train.state.make_optimizer(1e-3),
                                     jax.random.PRNGKey(0))
    tr = train.Trainer(state, train.TrainerConfig(epochs=1))
    bad = x[4:].copy()
    bad[0, 0, 0, :4] = np.nan
    batches = [{"x": x[:4], "y": y[:4]}, {"x": bad, "y": y[4:]}]
    with caplog.at_level(_logging.WARNING):
        loss = tr.train_epoch(iter(batches), epoch=0)
    assert np.isfinite(loss)
    assert any("skipped by the non-finite sentinel" in r.message
               for r in caplog.records)


def test_freeze_except_masks_updates():
    """freeze_except (reference DiffEEG_utils.py:603-606): only params
    whose path matches a names_to_train substring move; others stay
    bitwise frozen."""
    model = models.EEGNet(samples=64, kern_length=8)
    rng_np = np.random.default_rng(0)
    x = rng_np.standard_normal((4, 1, 37, 64)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng_np.integers(0, 6, 4)]
    tx = train.freeze_except(train.state.make_optimizer(1e-2),
                             model.init(jax.random.PRNGKey(0),
                                        jnp.asarray(x))["params"],
                             ["dense"])
    state = train.create_train_state(model, (jnp.asarray(x),), tx,
                                     jax.random.PRNGKey(0))
    step = train.make_train_step()
    new_state, _ = step(state, {"x": jnp.asarray(x), "y": jnp.asarray(y)},
                        jax.random.PRNGKey(1))
    import flax
    flat_old = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(state.params))
    flat_new = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(new_state.params))
    moved = froze = 0
    for k in flat_old:
        name = "/".join(k)
        if "dense" in name:
            moved += int(not np.array_equal(np.asarray(flat_old[k]),
                                            np.asarray(flat_new[k])))
        else:
            np.testing.assert_array_equal(np.asarray(flat_old[k]),
                                          np.asarray(flat_new[k]))
            froze += 1
    assert moved >= 1 and froze >= 1


def test_train_step_nan_sentinel_freezes_ema_and_advances_step():
    """Single-device sentinel contract: on a skipped step the EMA params
    stay bitwise frozen (no decay toward the frozen online params) and the
    step counter still advances (stream position was consumed)."""
    model = models.EEGNet(samples=64, kern_length=8)
    rng_np = np.random.default_rng(0)
    x = rng_np.standard_normal((4, 1, 37, 64)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng_np.integers(0, 6, 4)]
    state = train.create_train_state(model, (jnp.asarray(x[:2]),),
                                     train.state.make_optimizer(1e-3),
                                     jax.random.PRNGKey(0), with_ema=True)
    step = train.make_train_step(ema_decay=0.9)
    # warm the EMA away from the online params with one finite step
    state, _ = step(state, {"x": jnp.asarray(x), "y": jnp.asarray(y)},
                    jax.random.PRNGKey(1))
    bad = x.copy()
    bad[0, 0, 0, :4] = np.nan
    new_state, m = step(state, {"x": jnp.asarray(bad),
                                "y": jnp.asarray(y)}, jax.random.PRNGKey(1))
    assert bool(m["nonfinite"])
    assert int(new_state.step) == int(state.step) + 1
    for a, b in zip(jax.tree_util.tree_leaves(new_state.ema_params),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Mesh/sharding tests on the virtual 8-device CPU platform (SURVEY.md §4
layer 5): DP gradient equivalence, TP sharding, seq-parallel exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import multimodal_brain_pattern_identification_xai_tpu.config as C
from multimodal_brain_pattern_identification_xai_tpu import (models, parallel,
                                                             train)


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = parallel.make_mesh(C.MeshConfig(data=-1, model=2, seq=2))
    assert mesh.shape == {"data": 2, "model": 2, "seq": 2}
    mesh1 = parallel.make_mesh(C.MeshConfig(data=-1))
    assert mesh1.shape["data"] == 8
    with pytest.raises(ValueError):
        parallel.make_mesh(C.MeshConfig(data=3, model=2, seq=2))


def _setup_state(rng, optimizer="adam"):
    model = models.EEGNet(samples=128, kern_length=8)
    x = jnp.asarray(rng.standard_normal((8, 1, 37, 128)), jnp.float32)
    y = jnp.asarray(np.eye(6, dtype=np.float32)[rng.integers(0, 6, 8)])
    tx = train.state.make_optimizer(1e-3, optimizer=optimizer)
    state = train.create_train_state(model, (x,), tx, jax.random.PRNGKey(0))
    return state, {"x": np.asarray(x), "y": np.asarray(y)}


@pytest.mark.slow
def test_parallel_step_matches_single_device(rng):
    """DP-sharded step == unsharded step (gradient psum correctness).

    Uses the WaveNet (no BatchNorm/dropout — under DP the BN batch stats
    are per-shard like DDP, and dropout masks are rank-decorrelated, so
    models with those layers legitimately differ from the single-device
    run) and SGD (linear in the gradient; Adam's g/|g| amplifies ~1e-8
    reduction-order noise into ±lr sign flips on tiny-grad leaves)."""
    model = models.DilatedInceptionWaveNet(block_layers=(3, 2),
                                           block_dims=(8, 8))
    x = jnp.asarray(rng.standard_normal((8, 64, 8)), jnp.float32)
    y = jnp.asarray(np.eye(6, dtype=np.float32)[rng.integers(0, 6, 8)])
    tx = train.state.make_optimizer(1e-2, optimizer="sgd")
    state_a = train.create_train_state(model, (x,), tx, jax.random.PRNGKey(0))
    state_b = jax.tree_util.tree_map(lambda t: t, state_a)

    plain_step = train.make_train_step()
    mesh = parallel.make_mesh(C.MeshConfig(data=4, model=2, seq=1))
    par_step = parallel.make_parallel_train_step(mesh, state_b, donate=False)

    key = jax.random.PRNGKey(1)
    jb = {"x": x, "y": y}
    sb = parallel.shard_batch(mesh, {"x": np.asarray(x), "y": np.asarray(y)})
    state_a, ma = plain_step(state_a, jb, key)
    state_b, mb = par_step(state_b, sb, key)
    assert abs(float(ma["loss"]) - float(mb["loss"])) < 1e-5
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_replay_dp_loss_matches_mesh_step_with_dropout_and_bn(rng):
    """``replay_dp_loss_single_device`` reproduces the mesh step's loss
    EXACTLY (f32 reduction order) even for models with dropout and
    BatchNorm, by replaying the per-shard semantics (rank-decorrelated
    dropout keys, per-shard BN stats, shard-mean) serially — the
    correctness assert the multichip dry-run runs (VERDICT r4 #4)."""
    model = models.EEGNet(samples=128, kern_length=8)   # dropout + BN
    x = jnp.asarray(rng.standard_normal((8, 1, 37, 128)), jnp.float32)
    y = jnp.asarray(np.eye(6, dtype=np.float32)[rng.integers(0, 6, 8)])
    tx = train.state.make_optimizer(1e-3)
    state = train.create_train_state(model, (x,), tx, jax.random.PRNGKey(0))

    mesh = parallel.make_mesh(C.MeshConfig(data=4, model=2, seq=1))
    par_step = parallel.make_parallel_train_step(mesh, state, donate=False)
    key = jax.random.PRNGKey(7)
    sb = parallel.shard_batch(mesh, {"x": np.asarray(x), "y": np.asarray(y)})
    _, metrics = par_step(state, sb, key)

    replay = parallel.replay_dp_loss_single_device(
        state, {"x": np.asarray(x), "y": np.asarray(y)}, key, dp=4)
    assert abs(float(metrics["loss"]) - float(replay)) < 1e-5

    # a plain full-batch forward does NOT match (different dropout masks
    # and whole-batch BN stats) — the replay is load-bearing, not trivial
    plain_loss = parallel.replay_dp_loss_single_device(
        state, {"x": np.asarray(x), "y": np.asarray(y)}, key, dp=1)
    assert abs(float(plain_loss) - float(replay)) > 1e-4


@pytest.mark.slow
def test_grouped_conv_grad_partitioner_bug_is_avoided(rng):
    """Regression: XLA GSPMD zeroes grouped-conv grads on multi-axis
    meshes; EEGNet's depthwise stage is einsum-reformulated and the DP
    step is shard_map-based, so the depthwise gradient must be nonzero
    and match the single-device value."""
    state_a, batch = _setup_state(rng, optimizer="sgd")
    state_b = jax.tree_util.tree_map(lambda t: t, state_a)
    mesh = parallel.make_mesh(C.MeshConfig(data=4, model=2, seq=1))
    par_step = parallel.make_parallel_train_step(mesh, state_b, donate=False)
    plain_step = train.make_train_step()
    key = jax.random.PRNGKey(1)
    sb = parallel.shard_batch(mesh, batch)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    sa, _ = plain_step(state_a, jb, key)
    sbn, _ = par_step(state_b, sb, key)
    dw_a = np.asarray(sa.params["stem"]["depthwiseConv_kernel"]
                      - state_a.params["stem"]["depthwiseConv_kernel"])
    dw_b = np.asarray(sbn.params["stem"]["depthwiseConv_kernel"]
                      - state_a.params["stem"]["depthwiseConv_kernel"])
    assert np.abs(dw_b).max() > 0                     # not silently zeroed
    # dropout masks are rank-decorrelated, so exact equality is not
    # expected — but the gradient scale must match (same order):
    assert 0.2 < np.abs(dw_b).max() / np.abs(dw_a).max() < 5.0


def test_trainer_with_mesh_matches_single_device(tmp_path, rng):
    """Trainer(mesh=...) — the CLI's ``--mesh N`` DDP-equivalent loop —
    produces the same trajectory as the single-device Trainer: same data,
    dropout/BN-free model (DP decorrelates dropout and shards BN stats by
    design), SGD (linear in the psum-averaged gradient)."""
    model = models.DilatedInceptionWaveNet(block_layers=(3, 2),
                                           block_dims=(8, 8))
    x = rng.standard_normal((8, 64, 8)).astype(np.float32)
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, 8)]
    batches = [{"x": x, "y": y}]

    def make(mesh, sub):
        tx = train.state.make_optimizer(1e-2, optimizer="sgd")
        state = train.create_train_state(model, (jnp.asarray(x),), tx,
                                         jax.random.PRNGKey(0))
        cfg = train.TrainerConfig(epochs=2, eval_metrics=("kldiv",))
        return train.Trainer(state, cfg, ckpt_dir=str(tmp_path / sub),
                             mesh=mesh)

    mesh = parallel.make_mesh(C.MeshConfig(data=4, model=2, seq=1))
    t_single = make(None, "single")
    t_mesh = make(mesh, "mesh")
    s_a, best_a, _ = t_single.train_eval(lambda: iter(batches),
                                         lambda: iter(batches))
    s_b, best_b, _ = t_mesh.train_eval(lambda: iter(batches),
                                       lambda: iter(batches))
    assert abs(best_a - best_b) < 1e-4
    np.testing.assert_allclose(t_mesh.history["train_loss"],
                               t_single.history["train_loss"],
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_a.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    # the epoch snapshots written from the mesh-committed state restore
    # into a fresh single-device state (resume-after-DP-run works)
    restored = t_mesh.ckpt.load_best(jax.tree_util.tree_map(
        np.asarray, s_a))
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=0)


def test_diffeeg_trainer_mesh_matches_single_device(rng):
    """DiffEEGTrainer(mesh=...) — `train-diffeeg --mesh N` — psums the
    accumulated gradients correctly: with shard decorrelation off and the
    micro-batches tiled across the data axis, every shard reproduces the
    single-device draw stream, so the 2-shard trajectory must equal the
    single-device one on the untiled batch."""
    import multimodal_brain_pattern_identification_xai_tpu.config as CC

    def cfg(bs):
        return CC.DiffEEGConfig(n_channels=2, input_length=64,
                                hidden_channels=4, n_diffusion_steps=6,
                                gradient_accumulate_every=2, batch_size=bs,
                                stft_n_fft=16, stft_noverlap=8)

    mesh = parallel.make_mesh(C.MeshConfig(data=2, model=1, seq=1),
                              devices=jax.devices()[:2])
    single = train.DiffEEGTrainer(models.DiffEEG(n_channels=2, hidden=4),
                                  cfg(2), seed=0)
    dp = train.DiffEEGTrainer(models.DiffEEG(n_channels=2, hidden=4),
                              cfg(4), seed=0, mesh=mesh,
                              decorrelate_shards=False)

    g = np.random.default_rng(3)
    x = g.standard_normal((2, 2, 2, 64)).astype(np.float32)  # (K, B, C, T)
    y = np.eye(6, dtype=np.float32)[g.integers(0, 6, (2, 2))]
    x_tiled = np.concatenate([x, x], axis=1)                 # (K, 2B, C, T)
    y_tiled = np.concatenate([y, y], axis=1)

    key = jax.random.PRNGKey(11)
    for _ in range(2):
        single.state, single.ema, l_a = single._train_step(
            single.state, single.ema, key, jnp.asarray(x), jnp.asarray(y))
        dp.state, dp.ema, l_b = dp._train_step(
            dp.state, dp.ema, key, jnp.asarray(x_tiled),
            jnp.asarray(y_tiled))
    assert abs(float(l_a) - float(l_b)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(single.state.params),
                    jax.tree_util.tree_leaves(dp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(single.ema.params),
                    jax.tree_util.tree_leaves(dp.ema.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_tp_mlp_matches_dense(rng):
    import functools
    from jax import shard_map
    mesh = parallel.make_mesh(C.MeshConfig(data=1, model=8, seq=1))
    x = jnp.asarray(rng.standard_normal((4, 12)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((12, 128)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((128,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((128, 6)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((6,)) * 0.1, jnp.float32)
    ref = jax.nn.relu(x @ k1 + b1) @ k2 + b2

    from multimodal_brain_pattern_identification_xai_tpu.parallel import tp
    fn = shard_map(
        functools.partial(tp.tp_mlp, axis_name="model"),
        mesh=mesh,
        in_specs=(P(), P(None, "model"), P("model"), P("model", None), P()),
        out_specs=P(), check_vma=False)
    got = fn(x, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_tp_params_actually_sharded(rng):
    eeg = models.EEGNetAttentionRegularized(samples=128, kern_length=8)
    x = jnp.zeros((4, 1, 37, 128))
    tx = train.state.make_optimizer(1e-3)
    state = train.create_train_state(eeg, (x,), tx, jax.random.PRNGKey(0))
    mesh = parallel.make_mesh(C.MeshConfig(data=2, model=2, seq=2))
    sh = parallel.train.state_shardings(mesh, state)
    # dense1 kernel is TP-sharded on its output axis
    d1 = sh.params["dense1"]["kernel"]
    assert d1.spec == P(None, "model")
    # conv kernels replicated
    assert sh.params["stem"]["conv1"]["kernel"].spec == P()


def test_halo_conv_matches_global(rng):
    from jax import shard_map
    import functools
    mesh = parallel.make_mesh(C.MeshConfig(data=1, model=1, seq=8))
    x = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 3, 4)), jnp.float32) * 0.1

    ref = jax.lax.conv_general_dilated(
        x, k, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"))

    fn = shard_map(
        functools.partial(parallel.halo_conv1d, axis_name="seq"),
        mesh=mesh, in_specs=(P(None, "seq", None), P()), out_specs=P(None, "seq", None),
        check_vma=False)
    got = fn(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_long_eeg_seq_parallel_matches_local(rng):
    mesh = parallel.make_mesh(C.MeshConfig(data=1, model=1, seq=8))
    enc = parallel.LongEEGEncoder(n_channels=4, patch=8, d_model=32,
                                  depth=2, n_heads=4)
    params = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 4, 8 * 64)), jnp.float32)
    sp = parallel.long_eeg_forward(enc, params, x, mesh)
    local = enc.local_forward(params, x, axis_name=None)
    assert sp.shape == (2, 6)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(local),
                               rtol=1e-4, atol=1e-5)


def test_seq_parallel_attention_exact(rng):
    from jax import shard_map
    import functools
    mesh = parallel.make_mesh(C.MeshConfig(data=1, model=1, seq=8))
    q = jnp.asarray(rng.standard_normal((2, 32, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 32, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 32, 16)), jnp.float32)
    ref = parallel.seqparallel._local_attention(q, k, v, 4)
    fn = shard_map(
        functools.partial(parallel.sequence_parallel_attention, n_heads=4,
                          axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq", None),) * 3,
        out_specs=P(None, "seq", None), check_vma=False)
    got = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_multimodal_dp_step_on_mesh(rng):
    """The flagship multimodal pipeline (batch-sharded fused preprocess →
    late-fusion DP train step) under a multi-axis mesh — what
    __graft_entry__'s multichip dryrun runs: finite loss, both branch
    subtrees updated, depthwise gradient not zeroed by the partitioner."""
    from multimodal_brain_pattern_identification_xai_tpu import ops

    sig = C.SignalConfig(fixed_length=512, image_size=(64, 48))
    raw_eeg = (rng.standard_normal((8, 20, 2000)) * 40).astype(np.float32)
    raw_spec = (rng.standard_normal((8, 64, 48)) * 5).astype(np.float32)
    mesh = parallel.make_mesh(C.MeshConfig(data=4, model=2, seq=1))
    raw = parallel.shard_batch(mesh, {"eeg": raw_eeg, "spec": raw_spec})
    eeg_in, spec_in = jax.jit(
        lambda e, s: ops.preprocess_multimodal(e, s, signal=sig))(
            raw["eeg"], raw["spec"])
    mm = models.MultimodalModel(
        eeg_model=models.EEGNetAttentionRegularized(samples=512,
                                                    kern_length=16),
        spectrogram_model=models.SpectrogramCNN())
    state = train.create_train_state(mm, (eeg_in[:2], spec_in[:2]),
                                     train.state.make_optimizer(1e-3),
                                     jax.random.PRNGKey(0))
    step = parallel.make_parallel_train_step(mesh, state, donate=False)
    y = np.eye(6, dtype=np.float32)[rng.integers(0, 6, 8)]
    batch = parallel.shard_batch(mesh, {"eeg": np.asarray(eeg_in),
                                        "spec": np.asarray(spec_in),
                                        "y": y})
    new_state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    for sub in ("eeg_model", "spectrogram_model"):
        before = jax.tree_util.tree_leaves(state.params[sub])
        after = jax.tree_util.tree_leaves(new_state.params[sub])
        assert any(not np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(after, before))
    dw = np.asarray(
        new_state.params["eeg_model"]["stem"]["depthwiseConv_kernel"]
        - state.params["eeg_model"]["stem"]["depthwiseConv_kernel"])
    assert np.abs(dw).max() > 0


def test_parallel_step_nan_sentinel_skips_update(rng):
    """A non-finite batch on the mesh path must SKIP the update (params,
    optimizer state and batch stats unchanged) and flag
    ``metrics['nonfinite']`` — the same contract as the single-device
    ``make_train_step`` sentinel (the in-jit analogue of the reference's
    NaN-abort guards, DiffEEG_utils.py:152-176)."""
    state, batch = _setup_state(rng)          # EEGNet: exercises BN stats
    mesh = parallel.make_mesh(C.MeshConfig(data=4, model=2, seq=1))
    step = parallel.make_parallel_train_step(mesh, state, donate=False)

    bad = dict(batch)
    bad["x"] = batch["x"].copy()
    bad["x"][0, 0, 0, :4] = np.nan
    sb = parallel.shard_batch(mesh, bad)
    new_state, m = step(state, sb, jax.random.PRNGKey(1))
    assert bool(m["nonfinite"])
    # the step counter still advances on a skipped step (stream position)
    assert int(new_state.step) == int(state.step) + 1
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                    jax.tree_util.tree_leaves(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and a finite batch still updates
    sb = parallel.shard_batch(mesh, batch)
    new_state, m = step(state, sb, jax.random.PRNGKey(1))
    assert not bool(m["nonfinite"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                               jax.tree_util.tree_leaves(state.params)))


# ---------------------------------------------------------------------------
# __graft_entry__ driver hardening: the multichip dryrun must NEVER hang on
# a dead device tunnel (MULTICHIP_r03 rc=124).  jax.devices() blocks forever
# when the backend transport is down, so the entry probes it in a killable
# subprocess (no thread left blocked inside PJRT init in the driver's own
# process) and fails over to the CPU-subprocess payload path.
# ---------------------------------------------------------------------------

def _load_graft_entry():
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("_graft_entry_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_HANG_PROBE = "import time; time.sleep(3600)"


def test_probe_device_count_times_out_on_hung_backend(monkeypatch):
    """When the probe's jax.devices() blocks (tunnel down), the killable
    subprocess probe must return -1 within its timeout — and leave nothing
    blocked behind in this process."""
    import time
    ge = _load_graft_entry()
    monkeypatch.setattr(ge, "_PROBE_CODE", _HANG_PROBE)
    t0 = time.perf_counter()
    assert ge._probe_device_count(timeout_s=0.5) == -1
    assert time.perf_counter() - t0 < 5.0


def test_probe_device_count_reads_live_backend(monkeypatch):
    """With a healthy backend the probe reports its real device count (the
    in-process fast path's precondition).  Forced to the CPU platform so
    the test is deterministic regardless of tunnel state."""
    ge = _load_graft_entry()
    monkeypatch.setattr(
        ge, "_PROBE_CODE",
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "print(len(jax.devices()))")
    assert ge._probe_device_count(timeout_s=300.0) >= 1


def test_dryrun_fails_over_to_subprocess_on_hung_probe(monkeypatch):
    """dryrun_multichip must take the CPU-subprocess path when the backend
    probe times out — the subprocess needs zero TPU hardware."""
    ge = _load_graft_entry()
    monkeypatch.setattr(ge, "_PROBE_CODE", _HANG_PROBE)
    monkeypatch.setenv("DRYRUN_DEVICE_TIMEOUT", "0.5")
    calls = []
    monkeypatch.setattr(ge, "_dryrun_subprocess", calls.append)
    ge.dryrun_multichip(8)
    assert calls == [8]


@pytest.mark.slow
def test_dryrun_subprocess_completes_with_hung_backend(monkeypatch, capsys):
    """End-to-end: hung backend probe → real CPU subprocess runs the full
    DP×TP×SP payload to completion (the MULTICHIP artifact contract)."""
    ge = _load_graft_entry()
    monkeypatch.setattr(ge, "_PROBE_CODE", _HANG_PROBE)
    monkeypatch.setenv("DRYRUN_DEVICE_TIMEOUT", "0.5")
    ge.dryrun_multichip(2)
    assert "dryrun_multichip OK" in capsys.readouterr().out


@pytest.mark.slow
def test_initialize_multihost_two_process_step_matches_single():
    """REAL jax.distributed.initialize across two OS processes (2 local CPU
    devices each, 4 global) — the pod-scale entry point parallel/hosts.py
    wraps.  A cross-process psum and one DP train step must match a
    single-process 4-device run of identical state/batch bit-for-bit(ish).
    The dist.init_process_group analogue (training_distributed.py:24-27)."""
    import json as _json
    import os
    import socket
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    payload = os.path.join(repo, "tests", "_multihost_payload.py")

    with socket.socket() as s:
        s.bind(("localhost", 0))
        coord = f"localhost:{s.getsockname()[1]}"

    def env_with(n_local):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_local}")
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        return env

    procs = [subprocess.Popen(
        [sys.executable, payload, "multi", coord, "2", str(i)],
        cwd=repo, env=env_with(2), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for i in range(2)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{err[-2000:]}"
    multi = [_json.loads(out.splitlines()[-1]) for out, _ in outs]
    # both ranks observe the same replicated results
    assert multi[0] == multi[1]
    assert multi[0]["psum"] == 6.0

    single_p = subprocess.run(
        [sys.executable, payload, "single"], cwd=repo, env=env_with(4),
        capture_output=True, text=True, timeout=420)
    assert single_p.returncode == 0, single_p.stderr[-2000:]
    single = _json.loads(single_p.stdout.splitlines()[-1])
    assert single["psum"] == 6.0
    np.testing.assert_allclose(multi[0]["loss"], single["loss"], rtol=1e-6)
    # the 2×2 vs 1×4 topologies reduce pmean in different orders; f32
    # accumulation over ~300k |param| terms wobbles at the ~3e-6 level
    np.testing.assert_allclose(multi[0]["checksum"], single["checksum"],
                               rtol=1e-5)

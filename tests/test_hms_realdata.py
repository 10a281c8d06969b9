"""Real-HMS-data path: synthetic parquet tree in the reference's on-disk
schema (train.csv + train_eegs/*.parquet + train_spectrograms/*.parquet,
data_utils.py:72-95) driven end-to-end through the non-demo CLI commands
(main_2.py:259-413, XAI_Multimodality.py:539-571)."""

import os

import numpy as np
import pytest

from multimodal_brain_pattern_identification_xai_tpu import config as C
from multimodal_brain_pattern_identification_xai_tpu import data
from multimodal_brain_pattern_identification_xai_tpu.cli import main


@pytest.fixture(scope="module")
def hms_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("hms")
    data.write_synthetic_hms_tree(str(root), np.random.default_rng(7),
                                  n_eeg_ids=8, rows_per_eeg=2)
    return str(root)


def test_tree_schema(hms_tree):
    meta = data.load_train_metadata(os.path.join(hms_tree, "train.csv"))
    assert len(meta) == 16
    for col in ("eeg_id", "spectrogram_id", "patient_id",
                "expert_consensus") + C.TGT_VOTE_COLS:
        assert col in meta.columns
    eeg = data.load_eeg_parquet(os.path.join(hms_tree, "train_eegs"),
                                meta["eeg_id"].iloc[0])
    assert eeg.shape == (12_000, 20)
    spec = data.load_spectrogram_parquet(
        os.path.join(hms_tree, "train_spectrograms"),
        meta["spectrogram_id"].iloc[0])
    assert spec.shape == (320, 400)          # time column dropped


def test_aggregate_votes_by_eeg(hms_tree):
    meta = data.load_train_metadata(os.path.join(hms_tree, "train.csv"))
    agg = data.aggregate_votes_by_eeg(meta)
    assert len(agg["eeg_id"]) == 8           # 16 rows → 8 unique ids
    np.testing.assert_allclose(agg["y"].sum(axis=1), 1.0, rtol=1e-5)
    # vote sums: manual check for the first eeg_id
    eid = agg["eeg_id"][0]
    rows = meta[meta["eeg_id"] == eid]
    votes = rows[list(C.TGT_VOTE_COLS)].to_numpy(np.float64).sum(0)
    np.testing.assert_allclose(agg["y"][0], votes / votes.sum(), rtol=1e-5)
    assert agg["patient_id"][0] == rows["patient_id"].iloc[0]


def test_parallel_cache_build_matches_serial(hms_tree, tmp_path):
    meta = data.load_train_metadata(os.path.join(hms_tree, "train.csv"))
    ids = meta["eeg_id"].unique()
    eeg_dir = os.path.join(hms_tree, "train_eegs")
    serial = data.EEGRecordCache(str(tmp_path / "s.npz")).build(
        eeg_dir, ids, n_workers=1)
    threaded = data.EEGRecordCache(str(tmp_path / "t.npz")).build(
        eeg_dir, ids, n_workers=4)
    assert len(serial) == len(threaded) == len(ids)
    for e in ids:
        np.testing.assert_array_equal(serial[e], threaded[e])


def test_wavenet_arrays_composition(hms_tree, tmp_path):
    paths = C.load_config(None, [f"paths.data_root={hms_tree}"]).paths
    src = data.wavenet_arrays(paths, cache_dir=str(tmp_path), n_workers=2)
    assert src["x"].shape == (8, 10_000, 20)
    assert src["y"].shape == (8, 6)
    assert np.isfinite(src["x"]).all()       # NaN repair in the cropper
    # cache round-trip: second call hits the npz
    src2 = data.wavenet_arrays(paths, cache_dir=str(tmp_path), n_workers=2)
    np.testing.assert_array_equal(src["x"], src2["x"])


def test_multimodal_source_batches(hms_tree, tmp_path):
    paths = C.load_config(None, [f"paths.data_root={hms_tree}"]).paths
    src = data.multimodal_source(paths, cache_dir=str(tmp_path),
                                 n_workers=2)
    assert len(src) == 16
    batch = next(src.batches(np.arange(6), 6))
    assert batch["eeg"].shape == (6, 20, 10_000)
    assert batch["spec"].shape == (6, 400, 300)
    assert batch["y"].shape == (6, 6)
    np.testing.assert_allclose(batch["y"].sum(1), 1.0)
    # offset rows of the same spectrogram differ (crop actually applied)
    b0 = src.gather(np.asarray([0]))
    b1 = src.gather(np.asarray([1]))
    assert not np.array_equal(b0["spec"], b1["spec"])


def test_multimodal_batches_reuse_buffers(hms_tree, tmp_path):
    """The 2-slot ring-buffer gather path yields batches identical to the
    allocate-per-batch path under the synced-transfer prefetcher (the
    training-loop configuration), across slot reuse."""
    paths = C.load_config(None, [f"paths.data_root={hms_tree}"]).paths
    src = data.multimodal_source(paths, cache_dir=str(tmp_path),
                                 n_workers=2)
    rows = np.arange(len(src))
    plain = [{k: v.copy() for k, v in b.items()}
             for b in src.batches(rows, 4, shuffle=True, seed=3)]
    reused = [{k: np.asarray(v) for k, v in b.items()}
              for b in data.prefetch_to_device(
                  src.batches(rows, 4, shuffle=True, seed=3,
                              reuse_buffers=True),
                  sync_transfers=True)]
    assert len(plain) == len(reused) == 4       # 16 rows / 4, 2 slots x2
    for a, b in zip(plain, reused):
        for k in ("eeg", "spec", "y"):
            np.testing.assert_array_equal(a[k], b[k])


def test_multimodal_batches_single_modality(hms_tree, tmp_path):
    """want=("eeg",)/("spec",) batches (the branch-pretraining data path)
    carry only the requested modality + labels, matching the combined
    gather's arrays — including under ring-buffer reuse."""
    paths = C.load_config(None, [f"paths.data_root={hms_tree}"]).paths
    src = data.multimodal_source(paths, cache_dir=str(tmp_path),
                                 n_workers=2)
    rows = np.arange(len(src))
    full = [{k: v.copy() for k, v in b.items()}
            for b in src.batches(rows, 4, shuffle=True, seed=3)]
    for key in ("eeg", "spec"):
        only = [{k: v.copy() for k, v in b.items()}
                for b in src.batches(rows, 4, shuffle=True, seed=3,
                                     want=(key,))]
        ringed = [{k: v.copy() for k, v in b.items()}
                  for b in src.batches(rows, 4, shuffle=True, seed=3,
                                       want=(key,), reuse_buffers=True)]
        for a, b, c in zip(full, only, ringed):
            assert set(b) == set(c) == {key, "y"}
            np.testing.assert_array_equal(a[key], b[key])
            np.testing.assert_array_equal(a["y"], b["y"])
            np.testing.assert_array_equal(a[key], c[key])


@pytest.mark.slow
def test_cli_train_wavenet_realdata(hms_tree, tmp_path):
    rc = main(["train-wavenet", "--set", f"paths.data_root={hms_tree}",
               "--set", "n_folds=2", "--one-fold", "--epochs", "1",
               "--batch-size", "4", "--ckpt-dir", str(tmp_path)])
    assert rc == 0
    oof = np.load(tmp_path / "oof.npy")
    assert oof.shape == (8, 6)
    assert np.abs(oof).sum() > 0             # fold-0 rows were written


@pytest.mark.slow
def test_cli_xai_realdata(hms_tree, tmp_path, capsys):
    """Non-demo XAI report composes: multimodal source → full-size
    preprocess → trained-checkpoint restore → saliency/SHAP/LIME/
    Grad-CAM artifacts at reference sizes.  Trains one epoch first so the
    restore path (same optimizer pytree as training) is actually hit."""
    rc = main(["train-multimodal", "--set", f"paths.data_root={hms_tree}",
               "--set", "n_folds=2", "--epochs", "1", "--batch-size", "4",
               "--ckpt-dir", str(tmp_path)])
    assert rc == 0
    rc = main(["xai", "--set", f"paths.data_root={hms_tree}",
               "--limit", "4", "--channel-retrain", "5", "--epochs", "1",
               "--ckpt-dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "restored best multimodal checkpoint" in out
    assert "channel-retrain: top-5 channels" in out
    import os
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert any("eeg_saliency" in f for f in pngs)
    assert any("spec_gradcam" in f for f in pngs)


@pytest.mark.slow
def test_cli_train_diffeeg_realdata(hms_tree, tmp_path):
    """Non-demo DiffEEG training composes: cache → 19-ch eeg_transform →
    step loop with STFT conditioning and an MMD eval."""
    rc = main(["train-diffeeg", "--set", f"paths.data_root={hms_tree}",
               "--set", "diffeeg.gradient_accumulate_every=2",
               "--set", "diffeeg.n_diffusion_steps=25",
               "--set", "diffeeg.hidden_channels=8",
               "--set", "diffeeg.evaluate_every=2",
               "--set", "diffeeg.save_and_sample_every=2",
               "--epochs", "2", "--batch-size", "2",
               "--ckpt-dir", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "diffeeg").exists()


@pytest.mark.slow
def test_cli_train_multimodal_realdata(hms_tree, tmp_path):
    rc = main(["train-multimodal", "--set", f"paths.data_root={hms_tree}",
               "--set", "n_folds=2", "--epochs", "1", "--batch-size", "4",
               "--ckpt-dir", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "multimodal").exists()


@pytest.mark.slow
def test_cli_train_multimodal_mesh_realdata(hms_tree, tmp_path):
    """--mesh on the REAL data path: the native ring-buffer gather
    (reuse_buffers) + sync_transfers prefetch + data-axis sharding
    compose — raw batches land sharded over the mesh before the fused
    preprocess, and the shard_map DP step trains on them."""
    rc = main(["train-multimodal", "--set", f"paths.data_root={hms_tree}",
               "--set", "n_folds=2", "--epochs", "1", "--batch-size", "4",
               "--mesh", "2", "--ckpt-dir", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "multimodal").exists()


@pytest.mark.slow
def test_cli_train_multimodal_resume_matches_uninterrupted(
        hms_tree, tmp_path, capsys):
    """CLI-level resume equivalence on the real data path: 1 epoch +
    `--resume` to 2 reproduces an uninterrupted 2-epoch run's loss
    trajectory and best metric exactly.  This exercises the full stack
    the guarantee depends on: epoch-keyed shuffle seeds, (epoch, batch)-
    keyed MixUp draws, deterministic native gather order, and the
    epoch-snapshot restore."""
    from multimodal_brain_pattern_identification_xai_tpu.train import (
        CheckpointManager)

    common = ["--set", f"paths.data_root={hms_tree}",
              "--set", "n_folds=2", "--batch-size", "4"]

    def run(ckpt, epochs, resume=False):
        args = ["train-multimodal", *common, "--epochs", str(epochs),
                "--ckpt-dir", str(ckpt)]
        assert main(args + (["--resume"] if resume else [])) == 0
        return capsys.readouterr().out

    out_a = run(tmp_path / "a", 2)
    run(tmp_path / "b", 1)
    out_b = run(tmp_path / "b", 2, resume=True)

    hist = {}
    for d in ("a", "b"):
        meta = CheckpointManager(
            str(tmp_path / d / "multimodal")).load_meta("step_2")
        assert meta is not None and meta["epoch"] == 1
        hist[d] = meta["history"]
    assert hist["a"]["train_loss"] == hist["b"]["train_loss"]
    assert hist["a"]["val_loss"] == hist["b"]["val_loss"]
    def best_val(out):
        line = next(l for l in out.splitlines() if "best kldiv" in l)
        return line.split("best kldiv:")[1].split(";")[0].strip()

    assert best_val(out_a) == best_val(out_b)


@pytest.mark.slow
def test_cli_predict_realdata(hms_tree, tmp_path, capsys):
    """The serving path: train-multimodal → predict writes a
    predictions.csv with one row per metadata row, per-class probability
    columns summing to 1, and argmax class names."""
    import pandas as pd

    common = ["--set", f"paths.data_root={hms_tree}",
              "--set", "n_folds=2", "--batch-size", "4"]
    assert main(["train-multimodal", *common, "--epochs", "1",
                 "--ckpt-dir", str(tmp_path)]) == 0
    # batch size 5 does not divide 16 rows → exercises the padded tail
    assert main(["predict", *common[:-2], "--batch-size", "5",
                 "--ckpt-dir", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "restored best multimodal checkpoint" in out
    df = pd.read_csv(tmp_path / "predictions.csv")
    assert len(df) == 16
    probs = df[[c for c in df.columns if c.startswith("p_")]].to_numpy()
    assert probs.shape == (16, 6)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)
    assert set(df["predicted_class"]) <= {
        "Seizure", "LPD", "GPD", "LRDA", "GRDA", "Other"}

    # the r5 reduced-resolution serving preset flows through --set and
    # serves the SAME checkpoint (the spec branch is fully-conv + GAP)
    assert main(["predict", *common[:-2], "--batch-size", "5",
                 "--set", "signal.image_size=[200,150]",
                 "--set", "signal.resize_mode=resample",
                 "--ckpt-dir", str(tmp_path)]) == 0
    df2 = pd.read_csv(tmp_path / "predictions.csv")
    probs2 = df2[[c for c in df2.columns
                  if c.startswith("p_")]].to_numpy()
    assert probs2.shape == (16, 6)
    np.testing.assert_allclose(probs2.sum(1), 1.0, atol=1e-5)

    # without a checkpoint the command refuses rather than predicting
    # from a fresh init
    assert main(["predict", *common[:-2],
                 "--ckpt-dir", str(tmp_path / "empty")]) == 1


@pytest.mark.slow
def test_cli_train_diffeeg_resume_matches_uninterrupted(hms_tree, tmp_path):
    """DiffEEG CLI resume on the real data path: 2 steps + --resume to 4
    equals an uninterrupted 4-step run bitwise (params and EMA).  This
    pins the micro-batch stream fast-forward: the resumed factory skips
    resumed_step × K micros of the epoch-seeded ordered queue, continuing
    exactly where the interrupted run stopped."""
    import jax
    from multimodal_brain_pattern_identification_xai_tpu import (
        models, train)

    ov = [f"paths.data_root={hms_tree}",
          "diffeeg.gradient_accumulate_every=2",
          "diffeeg.n_diffusion_steps=10",
          "diffeeg.hidden_channels=8",
          "diffeeg.evaluate_every=1000",
          "diffeeg.save_and_sample_every=1"]
    sets = sum((["--set", o] for o in ov), [])

    def run(d, steps, resume=False):
        args = ["train-diffeeg", *sets, "--epochs", str(steps),
                "--batch-size", "2", "--ckpt-dir", str(d)]
        assert main(args + (["--resume"] if resume else [])) == 0

    run(tmp_path / "a", 4)
    run(tmp_path / "b", 2)
    run(tmp_path / "b", 4, resume=True)

    cfg = C.load_config(None, ov).diffeeg
    cfg = __import__("dataclasses").replace(cfg, batch_size=2)
    leaves = {}
    for d in ("a", "b"):
        model = models.DiffEEG(n_channels=cfg.n_channels,
                               hidden=cfg.hidden_channels)
        tr = train.DiffEEGTrainer(model, cfg,
                                  ckpt_dir=str(tmp_path / d / "diffeeg"),
                                  seed=42)
        assert tr.load() == 4
        leaves[d] = (jax.tree_util.tree_leaves(tr.state.params),
                     jax.tree_util.tree_leaves(tr.ema.params))
    for part in range(2):
        for la, lb in zip(leaves["a"][part], leaves["b"][part]):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_cli_diffeeg_lifecycle(hms_tree, tmp_path):
    """The reference's headline DiffEEG purpose, end-to-end on the schema
    tree: train-diffeeg → generate (restores the trained checkpoint, EMA
    weights) → train-wavenet --augment-dir (balanced merge + retrain) —
    main.py:125-157 + DiffEEG_utils.py:291-370 + main_2.py:295-343."""
    ov = [f"paths.data_root={hms_tree}",
          "diffeeg.gradient_accumulate_every=2",
          "diffeeg.n_diffusion_steps=10",
          "diffeeg.hidden_channels=8",
          "diffeeg.evaluate_every=1000",
          "diffeeg.save_and_sample_every=2",
          "diffeeg.step_start_ema=0",
          "diffeeg.update_ema_every=1"]
    sets = sum((["--set", o] for o in ov), [])
    rc = main(["train-diffeeg", *sets, "--epochs", "2", "--batch-size", "2",
               "--ckpt-dir", str(tmp_path)])
    assert rc == 0
    rc = main(["generate", *sets, "--n-samples", "2",
               "--ckpt-dir", str(tmp_path)])
    assert rc == 0
    gen_dir = tmp_path / "generated"
    arrs = {c: np.load(gen_dir / f"generated_class_{c}.npy")
            for c in range(6)}
    for a in arrs.values():
        assert a.shape == (2, 19, 2000)
        assert np.isfinite(a).all()

    # generation used the EMA params (not the raw online params):
    # reconstruct class-0 sampling from the restored checkpoint both ways
    import jax
    from multimodal_brain_pattern_identification_xai_tpu import (
        diffusion, models, train)
    cfg = C.load_config(None, ov).diffeeg
    model = models.DiffEEG(n_channels=cfg.n_channels,
                           hidden=cfg.hidden_channels)
    tr = train.DiffEEGTrainer(model, cfg, ckpt_dir=str(tmp_path / "diffeeg"),
                              seed=42)
    assert tr.load() is not None
    kw = dict(n_samples=2, n_channels=cfg.n_channels, length=cfg.input_length)
    ema_out = diffusion.generate_for_class_cached(
        tr.schedule, model, {"params": tr.ema.params},
        jax.random.PRNGKey(42), 0, **kw)
    raw_out = diffusion.generate_for_class_cached(
        tr.schedule, model, {"params": tr.state.params},
        jax.random.PRNGKey(42), 0, **kw)
    np.testing.assert_array_equal(arrs[0], ema_out)
    assert not np.array_equal(arrs[0], raw_out)

    # augmented retrain consumes the generated pools (main_2.py:295-343)
    rc = main(["train-wavenet", "--set", f"paths.data_root={hms_tree}",
               "--set", "n_folds=2", "--one-fold", "--epochs", "1",
               "--batch-size", "4", "--augment-dir", str(gen_dir),
               "--ckpt-dir", str(tmp_path)])
    assert rc == 0
    oof = np.load(tmp_path / "oof.npy")
    assert len(oof) > 8                      # synthetic rows joined the CV


@pytest.mark.slow
def test_cli_branch_pretraining_handoff(hms_tree, tmp_path, capsys):
    """Branch pretraining workflow (training.py:12-109/:135-228, notebook
    :1319-1536): train-eeg + train-spectrogram produce branch checkpoints;
    train-multimodal --init-from grafts them — the grafted subtrees equal
    the branch best checkpoints exactly."""
    common = ["--set", f"paths.data_root={hms_tree}", "--set", "n_folds=2",
              "--epochs", "1", "--batch-size", "4",
              "--ckpt-dir", str(tmp_path)]
    assert main(["train-eeg", *common]) == 0
    assert main(["train-spectrogram", *common]) == 0
    assert (tmp_path / "eeg").is_dir() and (tmp_path / "spectrogram").is_dir()

    assert main(["train-multimodal", *common,
                 "--init-from", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "initialized eeg branch from" in out
    assert "initialized spectrogram branch from" in out

    # pin: the graft copies the branch best params verbatim
    import jax
    import jax.numpy as jnp
    from multimodal_brain_pattern_identification_xai_tpu import (
        models, ops, train)
    from multimodal_brain_pattern_identification_xai_tpu.cli import (
        _init_from_branches)
    cfg = C.load_config(None, [f"paths.data_root={hms_tree}"])
    rng = np.random.default_rng(0)
    eeg_in, spec_in = ops.preprocess_multimodal(
        jnp.asarray(rng.standard_normal((2, 20, 10_000)), jnp.float32),
        jnp.asarray(rng.standard_normal((2, 400, 300)), jnp.float32))
    mm = models.MultimodalModel(
        eeg_model=models.EEGNetAttentionRegularized(),
        spectrogram_model=models.SpectrogramCNN())
    state = train.create_train_state(
        mm, (eeg_in, spec_in), train.state.make_optimizer(cfg.trainer.lr),
        jax.random.PRNGKey(1))
    grafted = _init_from_branches(
        state, mm, {"eeg": eeg_in, "spec": spec_in}, str(tmp_path),
        cfg.trainer.lr)
    bmodel = models.EEGNetAttentionRegularized()
    bstate = train.create_train_state(
        bmodel, (eeg_in,), train.state.make_optimizer(cfg.trainer.lr),
        jax.random.PRNGKey(0))
    bstate = train.CheckpointManager(str(tmp_path / "eeg")).load_best(bstate)
    for a, b in zip(jax.tree_util.tree_leaves(grafted.params["eeg_model"]),
                    jax.tree_util.tree_leaves(bstate.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multimodal_gather_matches_reference_assembly(hms_tree, tmp_path):
    """The native resident-store gather reproduces the original per-row
    python assembly (cache transpose + crop_spectrogram) exactly — the
    batch-identity pin for putting the C++ runtime on the real path."""
    paths = C.load_config(None, [f"paths.data_root={hms_tree}"]).paths
    src = data.multimodal_source(paths, cache_dir=str(tmp_path),
                                 n_workers=2)
    cache = data.build_or_load_eeg_cache(
        os.path.join(str(tmp_path), "eeg_cache.npz"), paths.train_eegs,
        src.meta["eeg_id"].unique(), n_workers=2)
    store = data.SpectrogramStore(paths.train_spectr)
    rows = np.asarray([0, 1, 5, 7, 9, 15])
    batch = src.gather(rows)
    for i, r in enumerate(rows):
        eeg_ref = cache[src.meta["eeg_id"].iloc[r]].T
        np.testing.assert_array_equal(batch["eeg"][i], eeg_ref)
        raw = store[src.meta["spectrogram_id"].iloc[r]]
        off = src.meta["spectrogram_label_offset_seconds"].iloc[r]
        ref = data.crop_spectrogram(
            raw, None if np.isnan(off) else float(off))
        np.testing.assert_array_equal(batch["spec"][i], ref)


def test_cli_cache_build_and_convert_spectrograms(hms_tree, tmp_path):
    """CLI surfaces for the data-preparation sweeps: cache-build builds the
    EEG window cache (main.py:84-98); convert-spectrograms writes one
    (Freq, Time) .npy per spectrogram parquet (main3.py:79-94)."""
    ck = str(tmp_path / "ck")
    rc = main(["cache-build", "--set", f"paths.data_root={hms_tree}",
               "--ckpt-dir", ck])
    assert rc == 0
    cache = data.EEGRecordCache.load(os.path.join(ck, "eeg_cache.npz"))
    assert len(cache) == 8

    out = str(tmp_path / "npy")
    rc = main(["convert-spectrograms", "--set",
               f"paths.data_root={hms_tree}", "--ckpt-dir", out])
    assert rc == 0
    files = [f for f in os.listdir(os.path.join(out, "spectrograms_npy"))
             if f.endswith(".npy")]
    assert files
    arr = np.load(os.path.join(out, "spectrograms_npy", files[0]))
    assert arr.ndim == 2 and np.isfinite(arr).all()

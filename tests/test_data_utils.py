"""Data-layer + utils tests: parquet roundtrip, window cropping, cache,
batching/prefetch, dummy fixtures, loggers, plots, seeding."""

import json
import os

import numpy as np
import pytest
import jax

import multimodal_brain_pattern_identification_xai_tpu.config as C
from multimodal_brain_pattern_identification_xai_tpu import data, utils


def test_eeg_parquet_roundtrip(tmp_path, rng):
    import pandas as pd
    arr = rng.standard_normal((500, 20)).astype(np.float32)
    df = pd.DataFrame(arr, columns=list(C.EEG_COLUMNS))
    path = tmp_path / "123.parquet"
    df.to_parquet(path)
    got = data.load_eeg_parquet(str(tmp_path), 123)
    np.testing.assert_allclose(got, arr, rtol=1e-6)
    # column-order assert fires on permuted columns
    df2 = df[list(C.EEG_COLUMNS[::-1])]
    df2.to_parquet(tmp_path / "124.parquet")
    try:
        data.load_eeg_parquet(str(tmp_path), 124)
        assert False, "expected column-order assertion"
    except AssertionError:
        pass


def test_crop_eeg_window_center_and_nan(rng):
    eeg = rng.standard_normal((12_000, 20)).astype(np.float32)
    eeg[6000, 3] = np.nan
    win = data.crop_eeg_window(eeg, 10_000)
    assert win.shape == (10_000, 20)
    assert np.isfinite(win).all()
    np.testing.assert_allclose(win[0], eeg[1000], rtol=1e-6)
    short = data.crop_eeg_window(eeg[:5000], 10_000)
    assert short.shape == (10_000, 20)
    assert np.all(short[5000:] == 0)


def test_crop_spectrogram_offset():
    spec = np.arange(350 * 400, dtype=np.float32).reshape(350, 400)
    out = data.crop_spectrogram(spec, offset_seconds=20.0)
    assert out.shape == (400, 300)
    np.testing.assert_allclose(out[:, 0], spec[10, :])


def test_eeg_record_cache(tmp_path, rng):
    import pandas as pd
    for eid in (1, 2):
        df = pd.DataFrame(rng.standard_normal((11_000, 20)).astype(np.float32),
                          columns=list(C.EEG_COLUMNS))
        df.to_parquet(tmp_path / f"{eid}.parquet")
    cache = data.EEGRecordCache(str(tmp_path / "cache.npz"))
    cache.build(str(tmp_path), [1, 2])
    cache.save()
    loaded = data.EEGRecordCache.load(str(tmp_path / "cache.npz"))
    assert len(loaded) == 2 and 1 in loaded
    np.testing.assert_allclose(loaded[1], cache[1])


def test_batch_iterator_and_prefetch(rng):
    arrays = {"x": rng.standard_normal((10, 3)).astype(np.float32),
              "y": rng.standard_normal((10, 6)).astype(np.float32)}
    batches = list(data.batch_iterator(arrays, 4, shuffle=True, seed=0))
    assert len(batches) == 2 and batches[0]["x"].shape == (4, 3)
    dev_batches = list(data.prefetch_to_device(
        data.batch_iterator(arrays, 4), size=2))
    assert len(dev_batches) == 2
    assert isinstance(dev_batches[0]["x"], jax.Array)


def test_prefetch_propagates_producer_errors(rng):
    """A host-loader exception inside the producer thread must re-raise in
    the consumer (not hang it), and abandoning the generator must not
    deadlock the producer."""
    def bad_iter():
        yield {"x": rng.standard_normal((2, 3)).astype(np.float32)}
        raise RuntimeError("corrupt parquet")

    it = data.prefetch_to_device(bad_iter(), size=2)
    first = next(it)
    assert first["x"].shape == (2, 3)
    with pytest.raises(RuntimeError, match="corrupt parquet"):
        next(it)

    # abandoning mid-stream: close() must return promptly
    def slow_iter():
        for i in range(100):
            yield {"x": np.full((1,), i, np.float32)}
    g = data.prefetch_to_device(slow_iter(), size=2)
    _ = next(g)
    g.close()          # triggers the stop flag + drain; must not hang


def test_dummy_fixtures(rng):
    d = data.dummy_eeg_dataset(rng, n_per_class=2)
    assert d["x"].shape == (12, 19, 2000) and d["y"].shape == (12, 6)
    meta = data.dummy_metadata(rng, 30)
    assert set(C.TGT_VOTE_COLS) <= set(meta.columns)
    raw = data.synthetic_raw_eeg(4, rng)
    assert raw.shape == (4, 20, 10_000)
    spec = data.synthetic_raw_spectrogram(3, rng)
    assert spec.shape == (3, 400, 300)


def test_wandb_logger_jsonl_fallback(tmp_path):
    lg = utils.WandbLogger("proj", "exp1", log_dir=str(tmp_path))
    lg.log_loss(0.5, 1)
    lg.log_evaluation({"kldiv": 0.1}, 0)
    lg.plot_loss([1.0, 0.5, 0.25])
    lg.plot_metrics({"acc": [0.2, 0.4], "f1": [0.1, 0.3]})
    lg.finish()
    files = [f for f in os.listdir(tmp_path) if f.endswith(".jsonl")]
    assert files
    lines = [json.loads(l) for l in
             open(tmp_path / files[0]).read().strip().splitlines()]
    assert len(lines) == 5
    assert lines[2]["plots/loss"] == [1.0, 0.5, 0.25]
    assert lines[4]["plots/f1"] == [0.1, 0.3]


def test_plots_render(tmp_path, rng):
    p1 = utils.plot_training_curves({"loss": [1, 0.5, 0.2]}, str(tmp_path))
    p2 = utils.plot_confusion_matrix(rng.integers(0, 9, (6, 6)),
                                     list(C.CLASSES), str(tmp_path))
    p3 = utils.plot_class_distribution(rng.integers(0, 6, 50),
                                       rng.integers(0, 6, 80),
                                       list(C.CLASSES), str(tmp_path))
    p4 = utils.plot_real_vs_generated(rng.standard_normal((1, 4, 100)),
                                      rng.standard_normal((1, 4, 100)),
                                      str(tmp_path))
    p5 = utils.plot_saliency_heatmap(rng.random((37, 100)), str(tmp_path))
    p6 = utils.plot_lr_and_regularization([1e-3, 5e-4, 1e-4],
                                          [0.5, 0.4, 0.35], str(tmp_path))
    p7 = utils.plot_spectrogram_pair(rng.random((80, 60)),
                                     rng.random((80, 60, 3)), str(tmp_path))
    p8 = utils.plot_stft_comparison(rng.standard_normal(400),
                                    rng.standard_normal(400), str(tmp_path),
                                    nperseg=32, noverlap=16)
    for p in (p1, p2, p3, p4, p5, p6, p7, p8):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_seed_everything():
    key = utils.seed_everything(7)
    assert key.shape == (2,)
    a = np.random.rand()
    utils.seed_everything(7)
    b = np.random.rand()
    assert a == b


def test_benchmark_fn():
    import jax.numpy as jnp
    stats = utils.benchmark_fn(lambda: jnp.ones(8).sum(), warmup=1, iters=3)
    assert stats["median_s"] > 0 and stats["iters"] == 3


def test_detect_class_imbalance():
    from multimodal_brain_pattern_identification_xai_tpu import train
    y = np.eye(6, dtype=np.float32)[[0, 0, 0, 2, 5]]
    counts = train.detect_class_imbalance(y)
    assert counts == {0: 3, 1: 0, 2: 1, 3: 0, 4: 0, 5: 1}
    # raw integer labels work too (no argmax-over-values footgun)
    assert train.detect_class_imbalance(np.array([0, 1, 2, 5])) == {
        0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 1}


def test_model_summary_renders(tmp_path):
    """Model summary text + PNG (reference summary_multimodal,
    XAI_Multimodality.py:1947-1986)."""
    import jax.numpy as jnp
    from multimodal_brain_pattern_identification_xai_tpu import models
    m = models.EEGNet(samples=64, kern_length=8)
    text = utils.model_summary(m, jnp.zeros((1, 1, 37, 64)),
                               save_dir=str(tmp_path))
    assert "EEGNet" in text and "params" in text.lower()
    assert os.path.getsize(os.path.join(tmp_path, "model_summary.png")) > 0


def test_wandb_logger_with_stub_module(monkeypatch, tmp_path):
    """The wandb-present branch builds Table/plot.line from the wandb
    MODULE (a Run object has neither attribute) — pinned with a stub
    module so the path is exercised without the real wandb."""
    import sys
    import types

    calls = {"logged": [], "tables": [], "lines": []}
    stub = types.ModuleType("wandb")

    class _Run:
        def log(self, rec):
            calls["logged"].append(rec)

        def finish(self):
            calls["finished"] = True

    def _table(data=None, columns=None):
        calls["tables"].append((data, columns))
        return ("table", tuple(columns))

    def _line(table, x, y, title=None):
        calls["lines"].append((table, x, y, title))
        return ("line", y)

    stub.init = lambda **kw: _Run()
    stub.Table = _table
    stub.plot = types.SimpleNamespace(line=_line)
    monkeypatch.setitem(sys.modules, "wandb", stub)

    lg = utils.WandbLogger("proj", "exp2", log_dir=str(tmp_path))
    lg.log_loss(0.5, 1)
    lg.plot_loss([1.0, 0.5], label="loss")
    lg.plot_metrics({"f1": [0.1, 0.2]})
    lg.save_model("ckpt/x")
    lg.finish()
    assert calls["finished"]
    assert ("table", ("step", "loss")) in [t for t, _, _, _ in calls["lines"]]
    assert {"plots/loss": ("line", "loss")} in calls["logged"]
    assert {"plots/f1": ("line", "f1")} in calls["logged"]
    assert {"checkpoint": "ckpt/x"} in calls["logged"]
    # no JSONL fallback file was created for this logger
    assert not [f for f in os.listdir(tmp_path) if "exp2" in f]

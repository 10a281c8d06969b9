"""CLI smoke tests — the demo flows of every subcommand that runs in
seconds on CPU (the driver-style invocations a user would copy)."""

import subprocess
import sys
import os

import pytest

ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def _run(args, tmp_path):
    return subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from multimodal_brain_pattern_identification_xai_tpu.cli import main;"
         f"raise SystemExit(main({args!r}))"],
        capture_output=True, text=True, env=ENV, cwd="/root/repo",
        timeout=900)


@pytest.mark.slow
def test_cli_train_wavenet_demo(tmp_path):
    r = _run(["train-wavenet", "--demo", "--epochs", "1",
              "--batch-size", "8", "--ckpt-dir", str(tmp_path),
              "--set", "n_folds=2"], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "fold scores" in r.stdout
    assert os.path.exists(tmp_path / "oof.npy")


@pytest.mark.slow
def test_cli_generate_demo(tmp_path):
    r = _run(["generate", "--demo", "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    # no checkpoint in a fresh dir: demo warns and samples from fresh init
    assert "no diffeeg checkpoint found" in r.stdout
    assert os.path.exists(tmp_path / "generated" / "generated_class_5.npy")


@pytest.mark.slow
def test_cli_predict_demo(tmp_path):
    r = _run(["predict", "--demo", "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(tmp_path / "predictions.csv")
    assert "wrote 12 predictions" in r.stdout


@pytest.mark.slow
def test_cli_predict_mesh_matches_single_device(tmp_path):
    """predict --mesh 8 (data-parallel serving over the virtual mesh)
    produces the same probabilities as the single-device path."""
    import numpy as np
    import pandas as pd
    from multimodal_brain_pattern_identification_xai_tpu.cli import main

    assert main(["predict", "--demo", "--batch-size", "5",
                 "--ckpt-dir", str(tmp_path / "single")]) == 0
    assert main(["predict", "--demo", "--batch-size", "5", "--mesh", "8",
                 "--ckpt-dir", str(tmp_path / "mesh")]) == 0
    a = pd.read_csv(tmp_path / "single" / "predictions.csv")
    b = pd.read_csv(tmp_path / "mesh" / "predictions.csv")
    cols = [c for c in a.columns if c.startswith("p_")]
    np.testing.assert_allclose(a[cols].to_numpy(), b[cols].to_numpy(),
                               rtol=1e-5, atol=1e-6)
    assert (a["predicted_class"] == b["predicted_class"]).all()


@pytest.mark.slow
def test_cli_sanity_check(tmp_path):
    r = _run(["sanity-check", "--demo", "--epochs", "5",
              "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert any(f.startswith("sanity_recon") for f in os.listdir(tmp_path))

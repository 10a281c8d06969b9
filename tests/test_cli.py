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
def test_cli_predict_eval_demo(tmp_path):
    """predict --eval: the reference's notebook eval — KL-div, hard/soft
    accuracy, macro PRF and a confusion-matrix plot against the rows'
    labels."""
    r = _run(["predict", "--demo", "--eval", "--ckpt-dir", str(tmp_path)],
             tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "eval over 12 rows: kldiv" in r.stdout
    assert "macro P/R/F1" in r.stdout
    assert os.path.exists(tmp_path / "confusion_matrix.png")


@pytest.mark.slow
def test_cli_predict_torch_ckpt_demo(tmp_path):
    """predict --torch-ckpt: a reference-layout combined torch state dict
    (.pt) is imported (both branches + fusion head) and served — the
    one-command switch for a reference user's trained weights."""
    torch = __import__("torch")
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_ref import make_torch_multimodal
    sd, _ = make_torch_multimodal(seed=7, samples=600)
    pt = tmp_path / "combined.pt"
    torch.save(sd, str(pt))
    r = _run(["predict", "--demo", "--eval", "--torch-ckpt", str(pt),
              "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "imported torch multimodal checkpoint" in r.stdout
    assert "eval over 12 rows: kldiv" in r.stdout


@pytest.mark.slow
def test_cli_predict_fused_spec_matches_unfused(tmp_path):
    """predict --fused-spec 2 (phase-packed Pallas spec blocks) produces
    the same predictions as the standard path — same fresh-init params
    either way (the fused param shells mirror nn.Conv)."""
    import numpy as np
    import pandas as pd
    from multimodal_brain_pattern_identification_xai_tpu.cli import main

    assert main(["predict", "--demo",
                 "--ckpt-dir", str(tmp_path / "plain")]) == 0
    assert main(["predict", "--demo", "--fused-spec", "2",
                 "--ckpt-dir", str(tmp_path / "fused")]) == 0
    a = pd.read_csv(tmp_path / "plain" / "predictions.csv")
    b = pd.read_csv(tmp_path / "fused" / "predictions.csv")
    cols = [c for c in a.columns if c.startswith("p_")]
    np.testing.assert_allclose(a[cols].to_numpy(), b[cols].to_numpy(),
                               rtol=1e-4, atol=1e-5)
    assert (a["predicted_class"] == b["predicted_class"]).all()


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
def test_cli_train_multimodal_mesh_demo(tmp_path):
    """train-multimodal --mesh 2: the DDP-equivalent data-parallel
    training loop (training_distributed.py) driven from the CLI — raw
    batches land sharded over the mesh, the fused preprocess partitions,
    and the shard_map step psums gradients."""
    r = _run(["train-multimodal", "--demo", "--epochs", "1", "--mesh", "2",
              "--batch-size", "5", "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    # batch 5 rounds up to 6 (divisible by the data axis)
    assert "training over a 2-device data mesh, batch 6" in r.stdout
    assert "best kldiv" in r.stdout
    assert os.path.isdir(tmp_path / "multimodal")


@pytest.mark.slow
def test_cli_xai_mesh_demo(tmp_path):
    """xai --mesh 2: IG and the per-class SHAP sweep shard the explained
    samples over the data axis (BASELINE config #5) — and explain the
    whole batch, not just the first 2 samples."""
    r = _run(["xai", "--demo", "--mesh", "2",
              "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sharding 8 explained samples over a 2-device data mesh" \
        in r.stdout
    assert "top-10 channels" in r.stdout


@pytest.mark.slow
def test_cli_train_branch_arch_demo(tmp_path):
    """--arch selects the zoo model for branch pretraining (the
    reference's per-arch experiment scripts, main3.py:37-51): a non-default
    EEG arch and a non-default spectrogram arch both train end-to-end."""
    r = _run(["train-eeg", "--demo", "--epochs", "1", "--arch",
              "eegnet_residual", "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "eeg branch best kldiv" in r.stdout
    # deepconvnet needs full-length (≥829-sample) windows; the demo's
    # 600-sample crops get a clear error, not a flax shape blow-up
    r = _run(["train-eeg", "--demo", "--epochs", "1", "--arch",
              "deepconvnet", "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode != 0
    assert "DeepConvNet needs" in r.stderr
    r = _run(["train-spectrogram", "--demo", "--epochs", "1", "--arch",
              "efficientnet_b0", "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "spectrogram branch best kldiv" in r.stdout


def test_cli_train_branch_arch_rejects_wrong_branch(tmp_path):
    """--arch names from the other branch (or unknown) fail fast with the
    valid choices, before any data/model work."""
    r = _run(["train-eeg", "--demo", "--arch", "spectrogram_vit",
              "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode != 0
    assert "not a eeg-branch model" in r.stderr


@pytest.mark.slow
def test_cli_xai_fused_spec_demo(tmp_path):
    """xai --fused-spec 2: the full attribution report (saliency through
    the kernel's custom VJP, LIME forward, Grad-CAM whose perturbation
    point sits after the never-fused block 5) runs on a fused-serving
    model."""
    r = _run(["xai", "--demo", "--fused-spec", "2",
              "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "top-10 channels" in r.stdout
    assert "LIME top label" in r.stdout
    assert "grad-cam" in r.stdout.lower() or "gradcam" in r.stdout.lower()


@pytest.mark.slow
def test_cli_grid_search_demo(tmp_path):
    """grid-search: every grid point trains inside one vmapped jit
    (reference parallel_grid_search's GPU-pool, training_utils.py:48-132)."""
    r = _run(["grid-search", "--demo", "--epochs", "1",
              "--grid", "lr=1e-3,1e-2", "--ckpt-dir", str(tmp_path)],
             tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.count("lr=") >= 3          # 2 ranked rows + best line
    assert "best: lr=" in r.stdout


@pytest.mark.slow
def test_cli_sanity_check(tmp_path):
    r = _run(["sanity-check", "--demo", "--epochs", "5",
              "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert any(f.startswith("sanity_recon") for f in os.listdir(tmp_path))


@pytest.mark.slow
def test_cli_long_eeg_demo(tmp_path):
    """CLI surface for BASELINE config #4: sequence-parallel long-EEG
    encoder + rollout over the virtual mesh, heatmap written."""
    r = _run(["long-eeg", "--ckpt-dir", str(tmp_path)], tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(os.path.join(
        str(tmp_path), "long_eeg_rollout.png")) > 0

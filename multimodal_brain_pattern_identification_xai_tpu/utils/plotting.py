"""Plotting suite (reference data_utils.py:437-599 training curves /
confusion matrix and DiffEEG_utils.py:374-549 class-distribution and
real-vs-generated comparisons).  matplotlib with Agg backend; every
function returns the save path."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_training_curves(history: Dict[str, List[float]], save_dir: str,
                         name: str = "training_curves") -> str:
    """Loss/metric curves per epoch (data_utils.py:437-532)."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 5))
    for key, values in history.items():
        ax.plot(values, label=key)
    ax.set_xlabel("epoch")
    ax.legend()
    ax.grid(alpha=0.3)
    path = os.path.join(save_dir, f"{name}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_confusion_matrix(cm: np.ndarray, class_names: Sequence[str],
                          save_dir: str, name: str = "confusion_matrix",
                          normalize: bool = True) -> str:
    """Heatmap confusion matrix (create_confusion_matrix,
    data_utils.py:536-599) — matplotlib-native, no seaborn dependency."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    cm = np.asarray(cm, np.float64)
    if normalize:
        cm = cm / np.maximum(cm.sum(1, keepdims=True), 1)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(cm, cmap="Blues")
    ax.set_xticks(range(len(class_names)), class_names, rotation=45)
    ax.set_yticks(range(len(class_names)), class_names)
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(j, i, f"{cm[i, j]:.2f}", ha="center", va="center",
                    color="white" if cm[i, j] > 0.5 else "black")
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    fig.colorbar(im)
    path = os.path.join(save_dir, f"{name}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_class_distribution(labels_before: np.ndarray,
                            labels_after: Optional[np.ndarray],
                            class_names: Sequence[str], save_dir: str,
                            name: str = "class_distribution") -> str:
    """Before/after-augmentation class histogram (DiffEEG_utils.py:374-420)."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 4))
    n = len(class_names)
    before = np.bincount(np.asarray(labels_before), minlength=n)
    ax.bar(np.arange(n) - 0.2, before, width=0.4, label="before")
    if labels_after is not None:
        after = np.bincount(np.asarray(labels_after), minlength=n)
        ax.bar(np.arange(n) + 0.2, after, width=0.4, label="after")
    ax.set_xticks(range(n), class_names)
    ax.legend()
    path = os.path.join(save_dir, f"{name}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_real_vs_generated(real: np.ndarray, generated: np.ndarray,
                           save_dir: str, n_channels: int = 4,
                           name: str = "real_vs_generated") -> str:
    """Waveform comparison panels (DiffEEG_utils.py:424-529)."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    fig, axes = plt.subplots(n_channels, 2, figsize=(10, 2 * n_channels),
                             sharex=True)
    for c in range(n_channels):
        axes[c, 0].plot(real[0, c], lw=0.5)
        axes[c, 1].plot(generated[0, c], lw=0.5, color="tab:orange")
        axes[c, 0].set_ylabel(f"ch {c}")
    axes[0, 0].set_title("real")
    axes[0, 1].set_title("generated")
    path = os.path.join(save_dir, f"{name}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_lr_and_regularization(lrs: Sequence[float],
                               reg_losses: Sequence[float], save_dir: str,
                               name: str = "lr_and_regularization") -> str:
    """Two-panel LR-schedule + regularization-loss curves
    (plot_learning_rate_and_regularization, data_utils.py:467-501)."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    fig, (a0, a1) = plt.subplots(1, 2, figsize=(10, 4))
    a0.plot(list(lrs))
    a0.set_title("learning rate")
    a0.set_xlabel("epoch")
    a1.plot(list(reg_losses), color="tab:orange")
    a1.set_title("regularization loss")
    a1.set_xlabel("epoch")
    fig.tight_layout()
    path = os.path.join(save_dir, f"{name}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_spectrogram_pair(raw: np.ndarray, processed: np.ndarray,
                          save_dir: str,
                          name: str = "spectrogram_pair") -> str:
    """Raw-vs-processed spectrogram panels (plot_spectrograms,
    data_utils.py:99-127).  ``processed`` may carry a trailing tiled
    channel axis; panel shows channel 0 like the reference."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    proc = np.asarray(processed)
    if proc.ndim == 3:
        proc = proc[..., 0] if proc.shape[-1] <= 4 else proc[0]
    fig, (a0, a1) = plt.subplots(1, 2, figsize=(12, 5))
    im0 = a0.imshow(np.asarray(raw), aspect="auto", cmap="viridis")
    a0.set_title("raw")
    fig.colorbar(im0, ax=a0)
    im1 = a1.imshow(proc, aspect="auto", cmap="viridis")
    a1.set_title("processed")
    fig.colorbar(im1, ax=a1)
    path = os.path.join(save_dir, f"{name}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_stft_comparison(real_eeg: np.ndarray, generated_eeg: np.ndarray,
                         save_dir: str, nperseg: int = 64,
                         noverlap: int = 32,
                         name: str = "stft_comparison") -> str:
    """Real-vs-generated log1p-STFT panels for one channel
    (plot_spectrogram_comparison, DiffEEG_utils.py:479-529).  Inputs:
    (T,) single-channel EEG traces; the STFT runs through the same
    on-device op the DiffEEG conditioner uses."""
    from ..ops.stft import stft as _stft
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)

    def log_spec(sig):
        _, _, z = _stft(np.asarray(sig, np.float32)[None, None, :],
                        nperseg=nperseg, noverlap=noverlap)
        return np.log1p(np.abs(np.asarray(z)))[0, 0]

    fig, (a0, a1) = plt.subplots(1, 2, figsize=(12, 4))
    a0.imshow(log_spec(real_eeg), aspect="auto", origin="lower",
              cmap="viridis")
    a0.set_title("real spectrogram")
    a1.imshow(log_spec(generated_eeg), aspect="auto", origin="lower",
              cmap="viridis")
    a1.set_title("generated spectrogram")
    fig.tight_layout()
    path = os.path.join(save_dir, f"{name}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_saliency_heatmap(saliency: np.ndarray, save_dir: str,
                          name: str = "saliency",
                          channel_names: Optional[Sequence[str]] = None
                          ) -> str:
    """Per-channel |grad| heatmap (plot_eeg_saliency,
    XAI_Multimodality.py:3103-3130)."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    sal = np.asarray(saliency)
    sal = sal.reshape(-1, sal.shape[-1]) if sal.ndim > 2 else sal
    fig, ax = plt.subplots(figsize=(10, 6))
    im = ax.imshow(sal, aspect="auto", cmap="hot")
    if channel_names is not None:
        ax.set_yticks(range(len(channel_names)), channel_names, fontsize=6)
    ax.set_xlabel("time")
    fig.colorbar(im)
    path = os.path.join(save_dir, f"{name}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def model_summary(model, *example_inputs, save_dir: Optional[str] = None,
                  name: str = "model_summary") -> str:
    """Layer/param-count summary of a flax module (reference
    ``summary_multimodal``, XAI_Multimodality.py:1947-1986 — torchsummary
    rendered to a PNG).  Returns the summary text; with ``save_dir`` also
    renders it to ``<save_dir>/<name>.png`` like the reference."""
    import jax

    text = model.tabulate(jax.random.PRNGKey(0), *example_inputs,
                          depth=2, console_kwargs={"width": 120})
    if save_dir is not None:
        plt = _plt()
        os.makedirs(save_dir, exist_ok=True)
        n_lines = text.count("\n") + 1
        fig, ax = plt.subplots(figsize=(14, max(4, 0.18 * n_lines)))
        ax.text(0.01, 0.99, text, fontsize=7, family="monospace",
                va="top")
        ax.axis("off")
        fig.savefig(os.path.join(save_dir, f"{name}.png"), dpi=120,
                    bbox_inches="tight")
        plt.close(fig)
    return text


def plot_sample_grid(images: np.ndarray, save_dir: str,
                     name: str = "samples", ncols: int = 8) -> str:
    """Image-grid dump (reference ``visualize_samples`` for the MNIST
    sanity runs, DiffEEG_utils.py:532-549). ``images``: (N, H, W)."""
    plt = _plt()
    os.makedirs(save_dir, exist_ok=True)
    n = len(images)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(ncols, nrows))
    axes = np.atleast_2d(axes)
    for i in range(nrows * ncols):
        ax = axes[i // ncols, i % ncols]
        ax.axis("off")
        if i < n:
            ax.imshow(images[i], cmap="gray")
    path = os.path.join(save_dir, f"{name}.png")
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return path

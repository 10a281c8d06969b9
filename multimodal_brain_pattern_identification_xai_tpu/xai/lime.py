"""LIME on spectrograms (reference XAI_Multimodality.py:2695-2794: SLIC
100-segment superpixels → ``lime_image.LimeImageExplainer.explain_instance``
with 100–1000 perturbed forwards → top-label mask overlay).

TPU-native redesign of hot loop #6: mask generation and the ridge
regression stay on the host (tiny), but all N perturbed images run as ONE
batched device inference instead of N sequential forwards.

skimage is not a dependency: :func:`slic_segments` is a native numpy SLIC
(k-means over (intensity·m, x, y) features on a grid seed), and the LIME
fit is a closed-form ridge regression (lstsq) with lime's default
exponential distance kernel.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np


def slic_segments(image: np.ndarray, n_segments: int = 100,
                  compactness: float = 10.0, n_iter: int = 10) -> np.ndarray:
    """SLIC superpixels on a 2-D (H, W) intensity image → (H, W) int labels.

    Standard SLIC: grid-seeded cluster centers in (value, y, x) space,
    localized k-means with spatial scale ``S/compactness``.
    """
    img = np.asarray(image, np.float64)
    if img.ndim == 3:                      # (H, W, C) → mean intensity
        img = img.mean(-1)
    H, W = img.shape
    S = max(1, int(np.sqrt(H * W / n_segments)))
    ys = np.arange(S // 2, H, S)
    xs = np.arange(S // 2, W, S)
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    centers = np.stack([img[cy.ravel(), cx.ravel()],
                        cy.ravel().astype(np.float64),
                        cx.ravel().astype(np.float64)], axis=1)
    K = len(centers)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    m = compactness
    labels = np.zeros((H, W), np.int32)
    dist = np.full((H, W), np.inf)
    for _ in range(n_iter):
        dist[:] = np.inf
        for k in range(K):
            v, cyk, cxk = centers[k]
            y0, y1 = max(0, int(cyk) - S), min(H, int(cyk) + S + 1)
            x0, x1 = max(0, int(cxk) - S), min(W, int(cxk) + S + 1)
            patch = img[y0:y1, x0:x1]
            dy = yy[y0:y1, x0:x1] - cyk
            dx = xx[y0:y1, x0:x1] - cxk
            d = ((patch - v) ** 2
                 + (m / S) ** 2 * (dy ** 2 + dx ** 2))
            win = d < dist[y0:y1, x0:x1]
            dist[y0:y1, x0:x1] = np.where(win, d, dist[y0:y1, x0:x1])
            labels[y0:y1, x0:x1] = np.where(win, k, labels[y0:y1, x0:x1])
        # update centers
        for k in range(K):
            mask = labels == k
            if mask.any():
                centers[k] = (img[mask].mean(), yy[mask].mean(),
                              xx[mask].mean())
    # compact label ids
    _, labels = np.unique(labels, return_inverse=True)
    return labels.reshape(H, W).astype(np.int32)


def lime_explain(predict_fn: Callable[[np.ndarray], np.ndarray],
                 image: np.ndarray,
                 segments: Optional[np.ndarray] = None,
                 n_segments: int = 100,
                 num_samples: int = 1000,
                 kernel_width: float = 0.25,
                 top_label: Optional[int] = None,
                 hide_color: Optional[float] = None,
                 seed: int = 0) -> Dict:
    """LIME image explanation with lime's sampling/weighting semantics.

    Args:
        predict_fn: batched ``(N, H, W, C) → (N, n_classes)`` probability
            function (run your jitted model under the hood — ONE device
            batch for all perturbations).
        image: (H, W, C) float image in [0, 1].
        segments: optional precomputed (H, W) labels (else native SLIC).
        hide_color: value for switched-off superpixels; None → per-segment
            mean like lime's default.

    Returns dict with 'segments', 'label', 'weights' (per-segment ridge
    coefficients), 'heatmap' (H, W), and 'mask' of the top positive
    segments — the ``get_image_and_mask`` equivalent.
    """
    rng = np.random.default_rng(seed)
    img = np.asarray(image, np.float64)
    if segments is None:
        segments = slic_segments(img, n_segments)
    K = int(segments.max()) + 1

    fudged = img.copy()
    for k in range(K):
        mask = segments == k
        fudged[mask] = (hide_color if hide_color is not None
                        else img[mask].mean(0))

    # lime: first sample = all-ones (the original image)
    masks = rng.integers(0, 2, size=(num_samples, K))
    masks[0] = 1

    seg_onehot = (segments[None, :, :] == np.arange(K)[:, None, None])
    batch = np.where(
        # (N, K) @ segment maps → (N, H, W) keep-mask
        np.einsum("nk,khw->nhw", masks, seg_onehot)[..., None] > 0,
        img[None], fudged[None]).astype(np.float32)

    probs = np.asarray(predict_fn(batch))                 # (N, C)
    if top_label is None:
        top_label = int(np.argmax(probs[0]))

    # lime's kernel: exp(-d²/width²) with cosine distance on mask vectors
    d = 1.0 - (masks @ masks[0]) / (
        np.linalg.norm(masks, axis=1) * np.linalg.norm(masks[0]) + 1e-12)
    w = np.sqrt(np.exp(-(d ** 2) / kernel_width ** 2))

    X = masks * w[:, None]
    y = probs[:, top_label] * w
    coef, *_ = np.linalg.lstsq(
        X.T @ X + 1.0 * np.eye(K), X.T @ y, rcond=None)   # ridge α=1 (sklearn default)

    heat = coef[segments]
    order = np.argsort(-coef)
    pos = [k for k in order if coef[k] > 0][:5]           # num_features=5
    sel = np.isin(segments, pos)
    return {"segments": segments, "label": top_label, "weights": coef,
            "heatmap": heat, "mask": sel}


def mark_boundaries(image: np.ndarray, segments: np.ndarray,
                    color: Tuple[float, float, float] = (1.0, 1.0, 0.0)
                    ) -> np.ndarray:
    """Native skimage.segmentation.mark_boundaries equivalent: paint
    superpixel boundary pixels (4-neighbour label changes) onto an RGB
    copy of ``image`` (reference overlay, XAI_Multimodality.py:2784)."""
    img = np.asarray(image, np.float64)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    elif img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    out = img.copy()
    seg = np.asarray(segments)
    edge = np.zeros(seg.shape, bool)
    edge[:-1, :] |= seg[:-1, :] != seg[1:, :]
    edge[:, :-1] |= seg[:, :-1] != seg[:, 1:]
    out[edge] = color
    return out


def plot_lime_overlay(image: np.ndarray, explanation: Dict, save_dir: str,
                      name: str = "lime_overlay") -> str:
    """Render the LIME explanation like the reference's
    ``get_image_and_mask`` + ``mark_boundaries`` + ``plot_segments``
    cells (XAI_Multimodality.py:2737-2794): the superpixel grid, the
    top-positive-segment mask, and the boundary overlay side-by-side."""
    import os

    from .shap_plots import _plt
    plt = _plt()

    os.makedirs(save_dir, exist_ok=True)
    img = np.asarray(image, np.float64)
    base = img.mean(-1) if img.ndim == 3 else img
    lo, hi = float(base.min()), float(base.max())
    norm = (base - lo) / (hi - lo + 1e-12)
    seg = explanation["segments"]
    masked = np.where(explanation["mask"], norm, 0.3 * norm)
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(mark_boundaries(norm, seg))
    axes[0].set_title(f"superpixels ({seg.max() + 1})")
    axes[1].imshow(explanation["heatmap"], cmap="bwr")
    axes[1].set_title(f"LIME weights (label {explanation['label']})")
    axes[2].imshow(mark_boundaries(masked, seg))
    axes[2].set_title("top positive segments")
    for ax in axes:
        ax.axis("off")
    path = os.path.join(save_dir, f"{name}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path

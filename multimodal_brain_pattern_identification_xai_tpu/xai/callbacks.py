"""Trainer epoch callbacks composing XAI into the training loop.

The reference runs a LIME explanation on a fixed validation spectrogram
every epoch of combined training and saves the overlay
(``train_and_validate_combined``, XAI_Multimodality.py:1657-1680).  Here
that is a :class:`LimeEpochSnapshot` hooked into
``Trainer(epoch_callbacks=[...])`` — the perturbed forwards run as ONE
jitted device batch per snapshot.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np

from .lime import lime_explain

logger = logging.getLogger(__name__)


class LimeEpochSnapshot:
    """Per-epoch LIME snapshot on a fixed spectrogram sample.

    Args:
        model: the multimodal flax module (needs ``forward_spectrogram``).
        sample_chw: (3, H, W) preprocessed spectrogram in [0, 1].
        out_dir: directory for ``lime_epoch{N}.png`` artifacts.
        every: snapshot every N epochs (reference: every epoch).
    """

    def __init__(self, model, sample_chw: np.ndarray, out_dir: str,
                 every: int = 1, n_segments: int = 100,
                 num_samples: int = 200, seed: int = 0):
        self.model = model
        self.sample_hwc = np.asarray(sample_chw).transpose(1, 2, 0)
        self.out_dir = out_dir
        self.every = max(1, every)
        self.n_segments = n_segments
        self.num_samples = num_samples
        self.seed = seed
        self.results: list = []
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, trainer, epoch: int, val_result) -> None:
        if epoch % self.every:
            return
        import jax.numpy as jnp

        variables = {"params": trainer.state.params}
        if trainer.state.batch_stats is not None:
            variables["batch_stats"] = trainer.state.batch_stats

        def predict(batch_hwc: np.ndarray) -> np.ndarray:
            spec = jnp.asarray(batch_hwc).transpose(0, 3, 1, 2)
            logp = self.model.apply(variables, spec,
                                    method=self.model.forward_spectrogram)
            return np.asarray(jnp.exp(logp))

        res = lime_explain(predict, self.sample_hwc,
                           n_segments=self.n_segments,
                           num_samples=self.num_samples, seed=self.seed)
        path = self._save_overlay(res, epoch)
        self.results.append({"epoch": epoch, "label": res["label"],
                             "path": path})
        logger.info("LIME snapshot epoch %d: top label %d → %s",
                    epoch, res["label"], path)

    def _save_overlay(self, res, epoch: int) -> Optional[str]:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:                       # headless-minimal envs
            return None
        img = self.sample_hwc.mean(-1)
        fig, ax = plt.subplots(figsize=(6, 5))
        ax.imshow(img, cmap="gray", aspect="auto")
        ax.imshow(np.ma.masked_where(~res["mask"], res["heatmap"]),
                  cmap="jet", alpha=0.5, aspect="auto")
        # mark_boundaries equivalent: outline superpixels of the mask
        seg = res["segments"]
        edge = np.zeros_like(seg, bool)
        edge[:-1] |= seg[:-1] != seg[1:]
        edge[:, :-1] |= seg[:, :-1] != seg[:, 1:]
        ax.contour(edge, levels=[0.5], colors="yellow", linewidths=0.3)
        ax.set_title(f"LIME epoch {epoch} (label {res['label']})")
        path = os.path.join(self.out_dir, f"lime_epoch{epoch}.png")
        fig.savefig(path, dpi=90, bbox_inches="tight")
        plt.close(fig)
        return path

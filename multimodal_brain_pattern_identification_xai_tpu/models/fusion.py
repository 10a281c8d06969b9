"""Late-fusion multimodal model (reference ``MultimodalModel``,
models.py:350-379 / XAI_Multimodality.py:1082-1108): concatenate the EEG
branch's and the spectrogram branch's class outputs → FC128 → FC6 →
log-softmax.  ``forward_spectrogram`` passthrough retained for the LIME
path."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import log_softmax


class MultimodalModel(nn.Module):
    eeg_model: Any
    spectrogram_model: Any
    num_classes: int = 6

    def setup(self):
        self.fc1 = nn.Dense(128, name="fc1")
        self.fc2 = nn.Dense(self.num_classes, name="fc2")

    def __call__(self, eeg_data: jnp.ndarray, spectrogram_data: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        eeg_out = self.eeg_model(eeg_data, train)
        spec_out = self.spectrogram_model(spectrogram_data, train)
        combined = jnp.concatenate([eeg_out, spec_out], axis=-1)
        x = nn.relu(self.fc1(combined))
        x = self.fc2(x)
        return log_softmax(x)

    def forward_eeg(self, eeg_data: jnp.ndarray, train: bool = False):
        """EEG branch alone — the SHAP GradientExplainer target
        (XAI_Multimodality.py:2242-2329 explains ``model.eeg_model``)."""
        return self.eeg_model(eeg_data, train)

    def forward_spectrogram(self, spectrogram_data: jnp.ndarray,
                            train: bool = False):
        """Spectrogram branch alone — the LIME predict_fn target
        (XAI_Multimodality.py:2749-2794)."""
        return self.spectrogram_model(spectrogram_data, train)

"""TPU-native multimodal brain-pattern identification + XAI framework.

A ground-up JAX/XLA/Pallas re-design of the capability set of
``KC-decoder/Multimodal-Brain-Pattern-Identification_XAI`` (the reference,
a PyTorch/scipy research repo for the HMS harmful-brain-activity
classification problem):

* batched, fused on-device DSP preprocessing (:mod:`.ops`) instead of
  per-sample scipy loops,
* a flax model zoo (:mod:`.models`) — EEGNet family, DeepConvNet,
  dilated-inception WaveNet, spectrogram CNN/ViT/EfficientNet and a
  late-fusion multimodal model,
* ``lax.scan`` DDPM diffusion augmentation (:mod:`.diffusion`, DiffEEG),
* jitted training with soft-label KLDiv, checkpointing, CV (:mod:`.train`),
* batched XAI — saliency, IG, expected-gradients SHAP, Grad-CAM, LIME,
  attention rollout (:mod:`.xai`),
* mesh/sharding parallelism over ICI (:mod:`.parallel`).

Import alias convention used throughout the repo::

    import multimodal_brain_pattern_identification_xai_tpu as mbx
"""

__version__ = "0.1.0"

from . import config  # noqa: F401

__all__ = ["config", "__version__"]

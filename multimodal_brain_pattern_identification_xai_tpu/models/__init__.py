"""Model zoo — flax re-implementations of the reference classifier zoo
(models.py:42-966), the notebook variants, the DiffEEG denoiser and the
spectrogram encoders, plus a name registry mirroring SURVEY.md §2.C/§2.D."""

from typing import Any, Callable, Dict

from .deepconvnet import DeepConvNet  # noqa: F401
from .diffeeg import (DiffEEG, DiffEEGSanityCheck, GTU,  # noqa: F401
                      make_cached_denoiser, recombine_spectrograms,
                      sinusoidal_embedding)
from .diffeeg_legacy import DiffEEGLegacy  # noqa: F401
from .eegnet import (EEGNet, EEGNetAttentionDeep,  # noqa: F401
                     EEGNetAttentionRegularized, EEGNetResidual,
                     EEGNetResidualLSTM, EEGNetTransformer,
                     EEGSeizureDetectionModel)
from .efficientnet import EfficientNetB0, EfficientNetV2B2  # noqa: F401
from .fusion import MultimodalModel  # noqa: F401
from .speccnn import SpectrogramCNN  # noqa: F401
from .vit import SpectrogramViT  # noqa: F401
from .torch_import import (load_torch_diffeeg_state_dict,  # noqa: F401
                           load_torch_diffeeg_legacy_state_dict,
                           load_torch_eegnet_state_dict,
                           load_torch_eegnet_attention_state_dict,
                           load_torch_efficientnet_state_dict,
                           load_torch_multimodal_state_dict,
                           load_torch_speccnn_state_dict,
                           load_torch_vit_state_dict)
from .wavenet import (DilatedInception, DilatedInceptionWaveNet,  # noqa: F401
                      GatedTCN, WaveBlock)

#: name → constructor, for config-driven model selection.
REGISTRY: Dict[str, Callable[..., Any]] = {
    "eegnet": EEGNet,
    "eegnet_attention_deep": EEGNetAttentionDeep,
    "eegnet_attention_regularized": EEGNetAttentionRegularized,
    "eegnet_residual": EEGNetResidual,
    "eegnet_residual_lstm": EEGNetResidualLSTM,
    "eegnet_transformer": EEGNetTransformer,
    "eeg_seizure_detection": EEGSeizureDetectionModel,
    "deepconvnet": DeepConvNet,
    "wavenet": DilatedInceptionWaveNet,
    "spectrogram_cnn": SpectrogramCNN,
    "spectrogram_vit": SpectrogramViT,
    "efficientnet_b0": EfficientNetB0,
    # the reference CFG's named preset (main3.py:40)
    "efficientnetv2_b2": EfficientNetV2B2,
    "diffeeg": DiffEEG,
    # the reference's older dead-code denoiser (diffusion_model.py:8-167)
    "diffeeg_legacy": DiffEEGLegacy,
}


def build(name: str, **kwargs: Any) -> Any:
    """Instantiate a model by registry name."""
    try:
        return REGISTRY[name](**kwargs)
    except KeyError:
        raise KeyError(f"unknown model {name!r}; available: {sorted(REGISTRY)}")

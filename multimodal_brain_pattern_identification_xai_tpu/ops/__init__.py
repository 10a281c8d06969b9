"""Batched on-device DSP kernel library.

Everything the reference does per-sample on the host with scipy
(``dataset.py:125-131``, ``data_utils.py:129-249``,
``XAI_Multimodality.py:841-870``, ``DiffEEG_utils.py:27-76``) is provided
here as jit/vmap-first JAX programs operating on whole batches in HBM.
"""

from .iir import (  # noqa: F401
    FilterCoeffs,
    butter_bandpass,
    butter_lowpass,
    iirnotch,
    lfilter,
    filtfilt,
)
from .montage import (  # noqa: F401
    montage_matrix,
    apply_montage,
    bipolar_differential,
    chris_magic_ch8,
)
from .normalize import (  # noqa: F401
    zscore,
    minmax,
    clip_scale,
    mu_law_encode,
    baseline_correction,
)
from .nanfix import nan_to_channel_mean  # noqa: F401
from .resample import (decimate, rolling_mean4_flat,  # noqa: F401
                       rolling_mean4_decimate_flat, pad_or_truncate)
from .stft import stft, stft_log1p_interp  # noqa: F401
from .smooth import gaussian_smooth2d  # noqa: F401
from .augment import spectrogram_augment  # noqa: F401
from . import preprocess  # noqa: F401
from .preprocess import (  # noqa: F401
    eeg_transform,
    hms_eeg_preprocess,
    hms_spectrogram_preprocess,
    preprocess_multimodal,
    mirror_eeg,
)
from .pallas_specblock import (  # noqa: F401
    fused_specblock_convpool,
    fused_specblock_convpool_vjp,
    choose_fused_config,
)

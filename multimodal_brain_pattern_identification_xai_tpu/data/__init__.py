"""Host-side data layer — parquet/CSV IO, window cropping, caching,
batching, dummy fixtures (reference data_utils.py:72-95, cfg_utils.py:354-389,
main.py:84-122, dataset.py:145-252).

Host code feeds raw numpy windows to the device; ALL signal processing
happens on-device (:mod:`..ops`)."""

from .loader import (load_eeg_parquet, load_spectrogram_parquet,  # noqa: F401
                     crop_eeg_window, crop_spectrogram,
                     EEGRecordCache, load_train_metadata)
from .batching import (batch_iterator, prefetch_to_device,  # noqa: F401
                       multimodal_batch_iterator)
from .dummy import (dummy_eeg_dataset, dummy_metadata,  # noqa: F401
                    synthetic_raw_eeg, synthetic_raw_spectrogram,
                    write_synthetic_hms_tree)
from .hms import (aggregate_votes_by_eeg, onehot_consensus,  # noqa: F401
                  build_or_load_eeg_cache, SpectrogramStore,
                  wavenet_arrays, MultimodalSource, multimodal_source)

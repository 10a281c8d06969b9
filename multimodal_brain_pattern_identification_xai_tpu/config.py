"""Unified typed configuration tree.

The reference keeps three divergent config systems (a 571-line YAML at
``root/config/config.yml``, a ``CFG`` class in ``root/src/utils/cfg_utils.py:42-175``
and a notebook re-declaration in ``XAI_Multimodality.py:93-273``).  Here they
are unified into one dataclass tree that is YAML-loadable and overridable
from the CLI, with no mutable global state.

All numeric defaults below reproduce the reference values (file:line cited
per field group).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

# ---------------------------------------------------------------------------
# Canonical channel / class vocabulary (reference root/config/config.yml:33-87)
# ---------------------------------------------------------------------------

#: Raw parquet column order, incl. EKG (config.yml:34-53).
EEG_COLUMNS: Tuple[str, ...] = (
    "Fp1", "F3", "C3", "P3", "F7", "T3", "T5", "O1", "Fz", "Cz", "Pz",
    "Fp2", "F4", "C4", "P4", "F8", "T4", "T6", "O2", "EKG",
)

#: The 19 scalp channels used as model features (config.yml:55-75).
EEG_FEATURES: Tuple[str, ...] = EEG_COLUMNS[:-1]

#: Classification targets (config.yml:78-87).
CLASSES: Tuple[str, ...] = ("Seizure", "LPD", "GPD", "LRDA", "GRDA", "Other")
NAME2LABEL: Dict[str, int] = {name: i for i, name in enumerate(CLASSES)}
LABEL2NAME: Dict[int, str] = {i: name for i, name in enumerate(CLASSES)}
N_CLASSES: int = len(CLASSES)

#: Per-class vote columns in train.csv (cfg_utils.py:76-80).
TGT_VOTE_COLS: Tuple[str, ...] = (
    "seizure_vote", "lpd_vote", "gpd_vote", "lrda_vote", "grda_vote", "other_vote",
)

#: 18 bipolar montage pairs — the double-banana montage (config.yml:529-548).
MAP_FEATURES: Tuple[Tuple[str, str], ...] = (
    ("Fp1", "F7"), ("F7", "T3"), ("T3", "T5"), ("T5", "O1"),
    ("Fp1", "F3"), ("F3", "C3"), ("C3", "P3"), ("P3", "O1"),
    ("Fp2", "F8"), ("F8", "T4"), ("T4", "T6"), ("T6", "O2"),
    ("Fp2", "F4"), ("F4", "C4"), ("C4", "P4"), ("P4", "O2"),
    ("Fz", "Cz"), ("Cz", "Pz"),
)

#: Chris' magic-8 bipolar pairs (dataset.py:111-121 / cfg_utils.py:87-90).
CHRIS_MAGIC_PAIRS: Tuple[Tuple[str, str], ...] = (
    ("Fp1", "T3"), ("T3", "O1"),
    ("Fp1", "C3"), ("C3", "O1"),
    ("Fp2", "C4"), ("C4", "O2"),
    ("Fp2", "T4"), ("T4", "O2"),
)

#: Brain-region channel groups used by mirror augmentation and the WaveNet
#: head (XAI_Multimodality.py CFG; models.py:937-961 region averaging).
LL: Tuple[str, ...] = ("Fp1", "F7", "T3", "T5", "O1")
LP: Tuple[str, ...] = ("Fp1", "F3", "C3", "P3", "O1")
RL: Tuple[str, ...] = ("Fp2", "F8", "T4", "T6", "O2")
RP: Tuple[str, ...] = ("Fp2", "F4", "C4", "P4", "O2")


# ---------------------------------------------------------------------------
# Dataclasses
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class BandpassConfig:
    """Butterworth bandpass parameters (config.yml:510-513)."""
    low: float = 0.5
    high: float = 20.0
    order: int = 2


@dataclass(frozen=True)
class SignalConfig:
    """Raw-EEG timing/shape parameters (config.yml:560-572, cfg_utils.py:73-75)."""
    sampling_rate: int = 200          # Hz
    seq_length_s: int = 50            # seconds
    n_samples: int = 10_000           # sampling_rate * seq_length_s
    out_samples: int = 2_000          # n_samples // downsample
    fixed_length: int = 3_000         # HMS_EEG_Dataset target length
    in_channels: int = 19             # scalp channels (no EKG)
    n_raw_channels: int = 20          # parquet columns incl. EKG
    image_size: Tuple[int, int] = (400, 300)  # spectrogram (F, T)
    #: how the spectrogram chain reaches ``image_size``: "pad" reproduces
    #: the reference bit-for-bit (zero-pad/crop FIRST, data_utils.py:163-181,
    #: which makes its final anti-aliased resize a same-shape identity —
    #: XAI_Multimodality.py:1182-1189); "resample" instead smoothly
    #: anti-alias-resizes the raw plane to ``image_size``
    #: (ops.resample.resize_antialiased, skimage resize(...,
    #: anti_aliasing=True) semantics) — the sane choice when setting a
    #: non-native target size.
    resize_mode: str = "pad"


@dataclass(frozen=True)
class EEGTransformConfig:
    """Flags of the raw-EEG transformer (cfg_utils.py:97-106, dataset.py:48-141)."""
    n_feats: int = 19
    apply_chris_magic_ch8: bool = False
    normalize: bool = True
    apply_butter_lowpass_filter: bool = True
    apply_mu_law_encoding: bool = False
    downsample: Optional[int] = 5
    lowpass_cutoff_hz: float = 20.0
    lowpass_order: int = 4
    clip_value: float = 1024.0
    scale: float = 32.0


@dataclass(frozen=True)
class HMSPreprocessConfig:
    """The HMS_EEG_Dataset preprocessing chain (XAI_Multimodality.py:760-886)."""
    bandpass: BandpassConfig = field(default_factory=BandpassConfig)
    first_bandpass_order: int = 5     # butter_bandpass default order (:842)
    denoise_bandpass_order: int = 6   # denoise_filter order (:864)
    decimate_stride: int = 4          # y[:, 0:-1:4]  (:866)
    zscore_eps: float = 1e-6          # normalize   (:871)
    notch_freq_hz: float = 60.0       # apply_notch_filter (data_utils.py:138-141)
    notch_quality: float = 30.0
    gaussian_sigma: float = 1.0       # smooth_spectrogram (data_utils.py:143-145)


@dataclass(frozen=True)
class SpecAugmentConfig:
    """Spectrogram train-time augmentation — the albumentations pipeline of
    ``get_augmentations`` (XAI_Multimodality.py:523-533): MixUp against a
    reference batch (p=0.5) + one full-height time stripe and one
    full-width frequency stripe CoarseDropout (hole extent 6-10%, p=0.5
    each), re-expressed as one jitted batched PRNG-driven program."""
    mixup_prob: float = 0.5
    mixup_alpha: float = 0.4          # albumentations A.MixUp default Beta α
    dropout_prob: float = 0.5         # per stripe family
    stripe_frac: Tuple[float, float] = (0.06, 0.1)


@dataclass(frozen=True)
class TrainerConfig:
    """Classifier trainer parameters (cfg_utils.py:109-127)."""
    epochs: int = 50
    lr: float = 1e-3
    batch_size: int = 256
    use_amp: bool = True              # → bfloat16 compute on TPU
    grad_accum_steps: int = 1
    ckpt_metric: str = "kldiv"
    ckpt_mode: str = "min"
    es_patience: int = 0
    step_per_batch: bool = True
    weight_decay: float = 0.0
    l2_lambda: float = 0.0            # manual L2 term (training.py / notebook loops)
    warmup_epochs: int = 5
    seed: int = 42


@dataclass(frozen=True)
class DiffEEGConfig:
    """DiffEEG diffusion trainer/model parameters (cfg_utils.py:139-175)."""
    epochs: int = 10
    n_channels: int = 19
    input_length: int = 2_000
    n_classes: int = 6
    hidden_channels: int = 32
    n_residual_layers: int = 16
    dropout: float = 0.1
    n_diffusion_steps: int = 1_000
    ema_decay: float = 0.995
    step_start_ema: int = 20
    update_ema_every: int = 10
    save_and_sample_every: int = 200
    gradient_accumulate_every: int = 50
    evaluate_every: int = 50
    lr: float = 1e-5
    batch_size: int = 64
    min_steps: int = 10_000           # DiffEEG_train.py:110
    # STFT conditioning parameters (cfg_utils.py:168-172)
    stft_n_fft: int = 64
    stft_noverlap: int = 32
    stft_window: str = "hann"
    #: rematerialize the denoiser in backward (the reference wraps its
    #: residual blocks in torch.utils.checkpoint, diffEEG.py:126-129,
    #: because of GPU memory pressure at B=64; v5e has HBM headroom, so
    #: the recompute is pure overhead — off by default, flip on for
    #: memory-constrained configs
    remat: bool = False
    #: fuse this many accumulation micro-batches into one fwd/bwd
    #: (must divide gradient_accumulate_every).  The averaged gradient is
    #: mathematically identical — mean over K micro-means = mean over K/f
    #: fused means at equal micro sizes — but the denoiser is small
    #: (~350k params), so B=64 under-fills the MXU; fusing raises per-pass
    #: batch to f·B.  1 = the reference's exact accumulation grouping.
    fuse_accum: int = 1
    #: bf16 compute in the denoiser's dense/conv layers (params, norms,
    #: loss and optimizer state stay f32) — the TPU analogue of the
    #: reference's AMP autocast + GradScaler training
    #: (DiffEEG_train.py:147-154).  Off by default so the pinned f32
    #: trajectories stay bitwise-reproducible; flip with
    #: ``--set diffeeg.amp=true``.
    amp: bool = False


@dataclass(frozen=True)
class PathsConfig:
    """Dataset/artifact locations (config.yml:17-23)."""
    data_root: str = "/data/hms"
    train_csv: str = "${data_root}/train.csv"
    train_eegs: str = "${data_root}/train_eegs/"
    train_spectr: str = "${data_root}/train_spectrograms/"
    checkpoint_dir: str = "checkpoints"
    log_dir: str = "logs"
    plot_dir: str = "plots"


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes for pjit/shard_map parallelism (new scope vs reference;
    replaces the reference's DDP/NCCL story, training_distributed.py:22-141)."""
    data: int = -1                    # -1 → all remaining devices
    model: int = 1                    # tensor-parallel axis (fusion head / dense)
    seq: int = 1                      # sequence-parallel axis (long-EEG encoder)


@dataclass(frozen=True)
class Config:
    """Root config object."""
    seed: int = 42
    debug: bool = False
    augment: bool = False             # config.yml:4 AUGMENT
    validation_frac: float = 0.4
    n_folds: int = 5
    paths: PathsConfig = field(default_factory=PathsConfig)
    signal: SignalConfig = field(default_factory=SignalConfig)
    bandpass: BandpassConfig = field(default_factory=BandpassConfig)
    eeg_transform: EEGTransformConfig = field(default_factory=EEGTransformConfig)
    hms: HMSPreprocessConfig = field(default_factory=HMSPreprocessConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    diffeeg: DiffEEGConfig = field(default_factory=DiffEEGConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # Derived vocab (kept on the object so downstream code needs no globals).
    classes: Tuple[str, ...] = CLASSES
    eeg_columns: Tuple[str, ...] = EEG_COLUMNS
    eeg_features: Tuple[str, ...] = EEG_FEATURES
    map_features: Tuple[Tuple[str, str], ...] = MAP_FEATURES

    @property
    def n_classes(self) -> int:
        return len(self.classes)

    @property
    def n_model_channels(self) -> int:
        """Channels seen by the HMS EEG models: 19 scalp + 18 bipolar = 37."""
        return len(self.eeg_features) + len(self.map_features)


# ---------------------------------------------------------------------------
# YAML / CLI loading
# ---------------------------------------------------------------------------

def _interp(value: Any, root: Dict[str, Any]) -> Any:
    """``${key}`` string interpolation like the reference config loader
    (config_loader.py:14-26)."""
    if isinstance(value, str):
        for k, v in root.items():
            if isinstance(v, str):
                value = value.replace("${%s}" % k, v)
    return value


def _deep_tuple(v: Any) -> Any:
    if isinstance(v, (list, tuple)):
        return tuple(_deep_tuple(x) for x in v)
    return v


def _update_dataclass(obj: Any, updates: Dict[str, Any]) -> Any:
    """Recursively apply a dict of overrides onto a (frozen) dataclass."""
    if not dataclasses.is_dataclass(obj):
        return updates
    kwargs = {}
    for f in dataclasses.fields(obj):
        if f.name in updates:
            cur = getattr(obj, f.name)
            upd = updates[f.name]
            if dataclasses.is_dataclass(cur) and isinstance(upd, dict):
                kwargs[f.name] = _update_dataclass(cur, upd)
            elif isinstance(cur, tuple) and isinstance(upd, list):
                # YAML has no tuples; keep tuple-typed fields (channel
                # vocab, montage pairs, image_size) hashable on reload
                kwargs[f.name] = _deep_tuple(upd)
            else:
                kwargs[f.name] = upd
    return dataclasses.replace(obj, **kwargs)


def dump_yaml(cfg: Config) -> str:
    """Serialize a :class:`Config` to YAML loadable by
    :func:`load_config` — the round-trippable counterpart of the
    reference's hand-maintained config.yml (571 lines that this replaces
    with one generated document)."""
    import yaml

    def clean(o: Any) -> Any:
        if dataclasses.is_dataclass(o):
            return {f.name: clean(getattr(o, f.name))
                    for f in dataclasses.fields(o)}
        if isinstance(o, (list, tuple)):
            return [clean(x) for x in o]
        return o

    doc = clean(cfg)
    # re-template the derived paths so a reloaded file still re-derives
    # them from a ``--set paths.data_root=...`` override
    root = doc["paths"].get("data_root", "")
    if root:
        for k, v in doc["paths"].items():
            if k != "data_root" and isinstance(v, str) \
                    and v.startswith(root):
                doc["paths"][k] = "${data_root}" + v[len(root):]
    return yaml.safe_dump(doc, sort_keys=False, width=78)


def load_config(path: Optional[str] = None,
                overrides: Optional[Sequence[str]] = None) -> Config:
    """Build a :class:`Config`, optionally from a YAML file plus
    ``key.subkey=value`` CLI-style overrides."""
    cfg = Config()
    if path is not None:
        import yaml
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        flat = {k: v for k, v in raw.items() if isinstance(v, str)}
        raw = {k: _interp(v, flat) for k, v in raw.items()}
        cfg = _update_dataclass(cfg, raw)
    for ov in overrides or ():
        key, _, val = ov.partition("=")
        import ast
        try:
            pyval: Any = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            # YAML-style booleans: ``--set diffeeg.amp=false`` must not
            # become the TRUTHY string "false"
            pyval = {"true": True, "false": False}.get(val.lower(), val)
        parts = key.split(".")
        d: Dict[str, Any] = {parts[-1]: pyval}
        for p in reversed(parts[:-1]):
            d = {p: d}
        cfg = _update_dataclass(cfg, d)
    # resolve ${data_root} in the path fields AFTER overrides, so
    # ``--set paths.data_root=...`` rewires every derived path
    paths = cfg.paths
    resolved = {
        f.name: getattr(paths, f.name).replace("${data_root}",
                                               paths.data_root)
        for f in dataclasses.fields(paths)
        if isinstance(getattr(paths, f.name), str)
    }
    return dataclasses.replace(cfg, paths=dataclasses.replace(
        paths, **resolved))


def feature_to_index(columns: Sequence[str] = EEG_COLUMNS) -> Dict[str, int]:
    """Channel-name → row-index map (XAI notebook CFG.feature_to_index)."""
    return {name: i for i, name in enumerate(columns)}

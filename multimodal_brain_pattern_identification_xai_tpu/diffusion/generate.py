"""Class-conditional generation + dataset rebalancing (reference
``generate_for_class`` DiffEEG_utils.py:291-313 and
``augment_dataset_balanced`` :318-370, wiring main_2.py:295-343)."""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .process import reverse_diffusion
from .schedule import DiffusionSchedule


def generate_for_class(schedule: DiffusionSchedule,
                       denoise_fn: Callable[..., jnp.ndarray],
                       key: jax.Array,
                       class_id: int,
                       n_samples: int,
                       n_channels: int = 19,
                       length: int = 2000,
                       n_classes: int = 6,
                       spec_shape: Tuple[int, int] = (50, 50)) -> np.ndarray:
    """Generate ``n_samples`` EEG windows for one class from a zeros
    spectrogram prior (DiffEEG_utils.py:291-313)."""
    y = jax.nn.one_hot(jnp.full((n_samples,), class_id), n_classes)
    spec = jnp.zeros((n_samples, n_channels) + spec_shape)
    x = reverse_diffusion(schedule, denoise_fn, key, n_samples, y, spec,
                          (n_channels, length))
    return np.asarray(x)


def generate_for_class_cached(schedule: DiffusionSchedule,
                              model, variables,
                              key: jax.Array,
                              class_id: int,
                              n_samples: int,
                              n_channels: int = 19,
                              length: int = 2000,
                              n_classes: int = 6,
                              spec_shape: Tuple[int, int] = (50, 50)
                              ) -> np.ndarray:
    """:func:`generate_for_class` with the class/spectrogram conditioning
    precomputed once outside the reverse scan (``make_cached_denoiser``) —
    the sampling path ``cli generate`` uses on a restored checkpoint."""
    from ..models.diffeeg import make_cached_denoiser
    y = jax.nn.one_hot(jnp.full((n_samples,), class_id), n_classes)
    spec = jnp.zeros((n_samples, n_channels) + spec_shape)
    den = make_cached_denoiser(model, variables, y, spec, length)
    x = reverse_diffusion(schedule, den, key, n_samples, y, spec,
                          (n_channels, length))
    return np.asarray(x)


def augment_dataset_balanced(x_real: np.ndarray, y_real: np.ndarray,
                             generated: Dict[int, np.ndarray],
                             seed: int = 42,
                             target_per_class: Optional[int] = None,
                             groups: Optional[np.ndarray] = None,
                             synthetic_group_start: int = 100_000):
    """Merge real data with per-class synthetic EEG so every class reaches
    the majority-class count (reference ``augment_dataset_balanced``,
    DiffEEG_utils.py:318-370), then shuffle.

    Args:
        x_real: (N, ...) real windows.
        y_real: (N, n_classes) soft labels or (N,) int labels.
        generated: class_id → (M_c, ...) synthetic windows (e.g. loaded
            from ``generated_class_{c}.npy`` like main_2.py:301-316).
        groups: optional (N,) CV group ids; synthetic samples get fresh
            unique ids counting from ``synthetic_group_start`` (the
            reference's ``start_idx=100000`` synthetic eeg_ids,
            DiffEEG_utils.py:318) so GroupKFold spreads them.

    Returns ``(x, y)`` — or ``(x, y, groups)`` when ``groups`` is given.
    """
    if y_real.ndim == 1:
        n_classes = int(y_real.max()) + 1
        y_soft = np.eye(n_classes, dtype=np.float32)[y_real]
    else:
        y_soft = y_real.astype(np.float32)
        n_classes = y_soft.shape[1]
    hard = y_soft.argmax(1)
    counts = np.bincount(hard, minlength=n_classes)
    target = int(target_per_class or counts.max())

    xs, ys = [x_real], [y_soft]
    gs = [np.asarray(groups)] if groups is not None else None
    next_group = int(max(synthetic_group_start,
                         (np.asarray(groups).max() + 1)
                         if groups is not None and len(x_real) else 0))
    for c in range(n_classes):
        need = target - counts[c]
        pool = generated.get(c)
        if need <= 0 or pool is None or len(pool) == 0:
            continue
        take = min(need, len(pool))
        xs.append(pool[:take].astype(x_real.dtype))
        ys.append(np.eye(n_classes, dtype=np.float32)[np.full(take, c)])
        if gs is not None:
            gs.append(np.arange(next_group, next_group + take,
                                dtype=np.asarray(groups).dtype))
            next_group += take
    x_all = np.concatenate(xs, axis=0)
    y_all = np.concatenate(ys, axis=0)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(x_all))
    if gs is not None:
        return x_all[perm], y_all[perm], np.concatenate(gs)[perm]
    return x_all[perm], y_all[perm]

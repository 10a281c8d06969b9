"""Pallas TPU kernel for batched IIR filtering (SOS cascade).

Why a kernel: XLA lowers ``lax.scan`` to a device while-loop whose
per-iteration overhead dwarfs the ~24 vector ops a biquad cascade step
actually needs — the order-5 bandpass over (256·38 lanes × 10k samples)
costs ~97 ms via scan.  This kernel packs 1024 lanes into one (8, 128)
vector register tile and walks time in a tight ``fori_loop``, carrying the
2-tap state of each section in registers:

* lanes layout: (n_tiles, T, 8, 128) — each timestep of a tile is exactly
  one f32 vreg, the native VPU shape;
* grid (n_tiles, n_time_blocks), time innermost: filter state persists in
  a VMEM scratch across time blocks of the same tile (TPU grids iterate
  sequentially) and resets when a new lane tile starts;
* coefficients are Python-float compile-time constants (designed on host,
  float64, see :mod:`.iir`).

Measured ~25× faster than the scan path for the HMS preprocessing shapes.
Numerics are identical to the sequential SOS scan (same recurrence, same
order of operations per lane).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .iir import FilterCoeffs, _norm_section

LANE_TILE = 1024          # 8 sublanes × 128 lanes
TIME_BLOCK = 512


def _make_kernel(coefs: Tuple[Tuple[float, ...], ...], time_block: int,
                 zi: Tuple[Tuple[float, float], ...] = ()):
    """Kernel body.  ``zi``: optional per-section static steady-state
    coefficients — the filter state initializes to ``zi_k · x[0]`` per lane
    (scipy ``lfilter_zi`` semantics, what filtfilt needs) instead of zeros.

    (A time-unrolled variant that batched VMEM reads was measured
    perf-neutral on v5e — the cost is per-vreg-step issue overhead, not
    VMEM latency — and compiled far slower, so the scalar step stays.)"""
    K = len(coefs)

    def kernel(x_ref, o_ref, state):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            if zi:
                v0 = x_ref[0, 0]
                for k in range(K):
                    state[k, 0] = zi[k][0] * v0
                    state[k, 1] = zi[k][1] * v0
            else:
                state[...] = jnp.zeros_like(state)

        def body(t, zs):
            v = x_ref[0, t]
            new = []
            for k, (b0, b1, b2, a1, a2) in enumerate(coefs):
                z0, z1 = zs[2 * k], zs[2 * k + 1]
                y = b0 * v + z0
                z0n = b1 * v + z1 - a1 * y
                z1n = b2 * v - a2 * y
                new.extend([z0n, z1n])
                v = y
            o_ref[0, t] = v
            return tuple(new)

        init = tuple(state[k // 2, k % 2] for k in range(2 * K))
        final = jax.lax.fori_loop(0, time_block, body, init)
        for k in range(K):
            state[k, 0] = final[2 * k]
            state[k, 1] = final[2 * k + 1]

    return kernel


def _make_rolldec_kernel(coefs: Tuple[Tuple[float, ...], ...],
                         time_block: int):
    """Kernel with a fused epilogue: 4-tap rolling mean + stride-4
    decimation of the filtered signal (the reference's ``denoise_filter``
    tail, XAI_Multimodality.py:865-866).

    Exactness: the kept samples are t ∈ {0, 4, …, T−4}; their 4-tap means
    use y[t..t+3], never crossing the end of a channel when T % 4 == 0, so
    the reference's flat-roll channel-wrap artifact cannot reach any kept
    sample — per-lane history is exact.  The output block is ¼ the input
    block: 4× less HBM write traffic and no separate XLA rolling pass.
    """
    K = len(coefs)
    assert time_block % 4 == 0

    def kernel(x_ref, o_ref, state, hist):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            state[...] = jnp.zeros_like(state)

        def body(t, zs):
            v = x_ref[0, t]
            new = []
            for k, (b0, b1, b2, a1, a2) in enumerate(coefs):
                z0, z1 = zs[2 * k], zs[2 * k + 1]
                y = b0 * v + z0
                z0n = b1 * v + z1 - a1 * y
                z1n = b2 * v - a2 * y
                new.extend([z0n, z1n])
                v = y

            # rolling window: hist holds y_{t-3}, y_{t-2}, y_{t-1}
            @pl.when(t % 4 == 3)
            def _():
                mean = (hist[0] + hist[1] + hist[2] + v) * 0.25
                o_ref[0, (t - 3) // 4] = mean

            hist[0] = hist[1]
            hist[1] = hist[2]
            hist[2] = v
            return tuple(new)

        init = tuple(state[k // 2, k % 2] for k in range(2 * K))
        final = jax.lax.fori_loop(0, time_block, body, init)
        for k in range(K):
            state[k, 0] = final[2 * k]
            state[k, 1] = final[2 * k + 1]

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _pallas_sosfilt_2d(coeffs: FilterCoeffs, x: jnp.ndarray,
                       time_block: int, lane_tile: int,
                       interpret: bool,
                       zi: Tuple[Tuple[float, float], ...] = ()) -> jnp.ndarray:
    """Filter along the last axis of a (lanes, T) array."""
    L, T = x.shape
    # static per-section python-float coefficients
    coefs = []
    for sec in coeffs.sos:
        b, a = _norm_section(sec)
        coefs.append((float(b[0]), float(b[1]), float(b[2]),
                      float(a[1]), float(a[2])))
    coefs = tuple(coefs)
    K = len(coefs)

    lp = (-L) % lane_tile
    tp = (-T) % time_block
    xp = jnp.pad(x, ((0, lp), (0, tp)))
    Lp, Tp = xp.shape
    n_tiles = Lp // lane_tile
    n_tblocks = Tp // time_block
    sub = lane_tile // 128
    # (lanes, T) → (n_tiles, T, sub, 128): one vreg per (tile, t)
    xr = xp.reshape(n_tiles, sub, 128, Tp).transpose(0, 3, 1, 2)

    out = pl.pallas_call(
        _make_kernel(coefs, time_block, zi),
        out_shape=jax.ShapeDtypeStruct(xr.shape, xr.dtype),
        grid=(n_tiles, n_tblocks),
        in_specs=[pl.BlockSpec((1, time_block, sub, 128),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, time_block, sub, 128),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, 2, sub, 128), jnp.float32)],
        interpret=interpret,
    )(xr)

    out = out.transpose(0, 2, 3, 1).reshape(Lp, Tp)
    return out[:L, :T]


def pallas_lfilter(coeffs: FilterCoeffs, x: jnp.ndarray,
                   axis: int = -1,
                   time_block: int = TIME_BLOCK,
                   lane_tile: int = LANE_TILE,
                   interpret: bool = False,
                   steady_state_init: bool = False) -> jnp.ndarray:
    """``scipy.signal.sosfilt`` semantics along ``axis``; all other axes are
    independent lanes.  ``steady_state_init`` seeds each lane's state with
    ``lfilter_zi(section)·x[0]`` (filtfilt-style initialization).
    See module docstring for the execution model."""
    x = jnp.moveaxis(x, axis, -1)
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    zi: Tuple[Tuple[float, float], ...] = ()
    if steady_state_init:
        from .iir import _sos_zi
        zi = tuple((float(a), float(b)) for a, b in _sos_zi(coeffs))
    y2 = _pallas_sosfilt_2d(coeffs, x2, time_block, lane_tile, interpret, zi)
    y = y2.reshape(shape)
    return jnp.moveaxis(y, -1, axis)


def pallas_filtfilt(coeffs: FilterCoeffs, x: jnp.ndarray, axis: int = -1,
                    padlen: int = None, interpret: bool = False,
                    time_block: int = TIME_BLOCK) -> jnp.ndarray:
    """Zero-phase filtering (scipy ``filtfilt`` semantics: odd extension,
    ``lfilter_zi`` initial conditions, forward-backward) with both passes
    on the Pallas kernel — for the spectrogram notch hot path
    (data_utils.py:138-141)."""
    x = jnp.moveaxis(x, axis, -1)
    ntaps = max(len(coeffs.a), len(coeffs.b))
    if padlen is None:
        padlen = 3 * ntaps
    T = x.shape[-1]
    left = 2 * x[..., :1] - x[..., 1:padlen + 1][..., ::-1]
    right = 2 * x[..., -1:] - x[..., -padlen - 1:-1][..., ::-1]
    ext = jnp.concatenate([left, x, right], axis=-1)
    y = pallas_lfilter(coeffs, ext, time_block=time_block,
                       interpret=interpret, steady_state_init=True)
    y = y[..., ::-1]
    y = pallas_lfilter(coeffs, y, time_block=time_block,
                       interpret=interpret, steady_state_init=True)
    y = y[..., ::-1][..., padlen:padlen + T]
    return jnp.moveaxis(y, -1, axis)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _pallas_sosfilt_rolldec_2d(coeffs: FilterCoeffs, x: jnp.ndarray,
                               time_block: int, lane_tile: int,
                               interpret: bool) -> jnp.ndarray:
    """Filter + fused 4-tap rolling mean + ::4 decimation along the last
    axis of a (lanes, T) array (T % 4 == 0).  Returns (lanes, T // 4)."""
    L, T = x.shape
    assert T % 4 == 0
    coefs = []
    for sec in coeffs.sos:
        b, a = _norm_section(sec)
        coefs.append((float(b[0]), float(b[1]), float(b[2]),
                      float(a[1]), float(a[2])))
    coefs = tuple(coefs)
    K = len(coefs)

    lp = (-L) % lane_tile
    tp = (-T) % time_block
    xp = jnp.pad(x, ((0, lp), (0, tp)))
    Lp, Tp = xp.shape
    n_tiles = Lp // lane_tile
    n_tblocks = Tp // time_block
    sub = lane_tile // 128
    xr = xp.reshape(n_tiles, sub, 128, Tp).transpose(0, 3, 1, 2)

    out = pl.pallas_call(
        _make_rolldec_kernel(coefs, time_block),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, Tp // 4, sub, 128), xr.dtype),
        grid=(n_tiles, n_tblocks),
        in_specs=[pl.BlockSpec((1, time_block, sub, 128),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, time_block // 4, sub, 128),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, 2, sub, 128), jnp.float32),
                        pltpu.VMEM((3, sub, 128), jnp.float32)],
        interpret=interpret,
    )(xr)

    out = out.transpose(0, 2, 3, 1).reshape(Lp, Tp // 4)
    return out[:L, :T // 4]


def pallas_lfilter_rolldec(coeffs: FilterCoeffs, x: jnp.ndarray,
                           axis: int = -1,
                           time_block: int = TIME_BLOCK,
                           lane_tile: int = LANE_TILE,
                           interpret: bool = False) -> jnp.ndarray:
    """Filter + the reference ``denoise_filter`` tail (4-tap rolling mean,
    ::4 decimation) in one kernel pass.  T along ``axis`` must divide by 4.
    Exact vs the separate ops (see _make_rolldec_kernel docstring)."""
    x = jnp.moveaxis(x, axis, -1)
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    y2 = _pallas_sosfilt_rolldec_2d(coeffs, x2, time_block, lane_tile,
                                    interpret)
    y = y2.reshape(shape[:-1] + (shape[-1] // 4,))
    return jnp.moveaxis(y, -1, axis)

"""Fused Pallas TPU kernel for the spectrogram CNN's early blocks.

Why a kernel: the reference ``Spectrogram_Model``'s first two blocks
(models.py:42-107) run 3×3 convs with 16/32 output channels over 400×300
planes.  On TPU that shape is doubly hostile (BREAKDOWN_multimodal.json:
18%/30% MFU):

* XLA's conv mapping puts Cout on the MXU's 128-wide output lanes, so
  with Cout ≤ 32 at least 3/4 of the systolic array is idle;
* unfused conv→conv round trips move ~1 GB of 400×300×16 activations
  per conv at B=256 — the blocks sit right at the HBM roofline too.

This kernel keeps a strip of the image VMEM-resident through all three
convs + ReLU + the 2×2 pool and reformulates each conv as a
**phase-packed implicit GEMM**: activations live in space-to-depth
layout (pack_h=2 × pack_w pixel phases × channels on sublanes, block
position on lanes), and one GEMM computes all ``2·pack_w`` output phases
at once —

    out(2·pack_w·Cout, positions) = Wp(2·pack_w·Cout, T·Cin) @ P(T·Cin, positions)

where ``T = (2+2)·(pack_w+2)`` is the union of 3×3 taps over the phase
block.  The packed weight is 9/T dense (9/24 for 2×4, 9/16 for 2×2):
the MXU does redundant multiplies by structural zeros, in exchange for
128 fully-occupied rows (vs 16) and a ≥256-deep contraction.  ``P`` is
built in VMEM by pure sublane-row selects + small constant lane shifts —
space-to-depth turns im2col into aligned copies, no strided gathers.

Whether the packed GEMM's raw rate beats its 9/T useful-FLOP tax is a
microarchitecture question measured by ``bench.py --convprobe``
(``pallas_duty_pack*`` = this kernel's in-VMEM ceiling); this module is
the full-pipeline realization.  Serving-first: training uses the unfused
XLA path, but :func:`fused_specblock_convpool_vjp` gives the kernel a
custom backward (the vjp of the equivalent XLA chain) so input-gradient
XAI runs through fused-serving models too.

Layout details (per grid cell = one image strip of one sample):

* every activation buffer is 2D ``(phase·Cin + c, lane)`` with
  ``lane = 1 + row·BCp + (col+1)`` — ``BCp = W/pack_w + 2`` block
  columns including one zero pad block each side, plus a 1-lane guard at
  each end so every tap's constant lane-shifted slice stays in bounds;
* each conv consumes a buffer with one more halo block-row than it
  produces (input carries 3, the pool input 0); strip halos are
  materialized host-side (XLA gather), image edges are zero-padded;
* pad columns / out-of-image halo rows are re-zeroed after every stage
  (SAME-conv semantics at the edges), so garbage never leaks inward;
* the 2×2 max/avg pool is a pure sublane-group reduction because pool
  windows never cross phase blocks (pack_h=2, pack_w even).

Reference parity: conv+ReLU×3 → pool of models.py:60-77 exactly
(tests pin vs an XLA ground truth in f32 and bf16).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK_H = 2  # fixed: 2×2 pool windows must not cross phase-block rows


def _taps(pack_w: int):
    """Covered-region tap enumeration shared by P-build and W-pack.

    Region = (PACK_H+2) rows × (pack_w+2) cols of pixels around one
    output phase block; tap t=(u,v) maps to input block offset
    (di, dj) and source phase (pr, pc).
    """
    out = []
    for u in range(PACK_H + 2):
        for v in range(pack_w + 2):
            di, pr = (u - 1) // PACK_H, (u - 1) % PACK_H
            dj, pc = (v - 1) // pack_w, (v - 1) % pack_w
            out.append((u, v, di, dj, pr * pack_w + pc))
    return out


def pack_conv_weights(kernel: jnp.ndarray, pack_w: int) -> jnp.ndarray:
    """(3,3,Cin,Cout) HWIO → phase-packed (2·pack_w·Cout, T·Cin).

    Row (pr·pack_w+pc)·Cout + o holds output phase (pr,pc), channel o;
    column t·Cin + c holds region tap t, input channel c.  Entries not
    reached by the 3×3 window are structural zeros (9/T density).
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3)
    ncols = (PACK_H + 2) * (pack_w + 2)
    wp = jnp.zeros((PACK_H * pack_w * cout, ncols * cin), kernel.dtype)
    for pr in range(PACK_H):
        for pc in range(pack_w):
            phase = pr * pack_w + pc
            for ky in range(3):
                for kx in range(3):
                    u, v = pr + ky, pc + kx
                    t = u * (pack_w + 2) + v
                    wp = wp.at[phase * cout:(phase + 1) * cout,
                               t * cin:(t + 1) * cin].set(kernel[ky, kx].T)
    return wp


def _prep_strips(x: jnp.ndarray, pack_w: int, hb: int) -> jnp.ndarray:
    """NHWC image → (B, S, 2·pack_w·C, (hb+6)·BCp + 2) packed halo strips.

    Zero-pads 3 halo block-rows (6 px) top/bottom and 1 block-col
    (pack_w px) each side, space-to-depths, and materializes overlapping
    strips (one fused XLA gather/transpose chain).
    """
    b, h, w, c = x.shape
    br, wb = h // PACK_H, w // pack_w
    s = br // hb
    bcp = wb + 2
    xp = jnp.pad(x, ((0, 0), (6, 6), (pack_w, pack_w), (0, 0)))
    xp = xp.reshape(b, br + 6, PACK_H, bcp, pack_w, c)
    xp = xp.transpose(0, 1, 2, 4, 5, 3)            # (B, R, pr, pc, C, BCp)
    strips = jnp.stack([xp[:, i * hb:i * hb + hb + 6] for i in range(s)], 1)
    strips = strips.transpose(0, 1, 3, 4, 5, 2, 6)  # (B,S,pr,pc,C,R,BCp)
    strips = strips.reshape(b, s, PACK_H * pack_w * c, (hb + 6) * bcp)
    return jnp.pad(strips, ((0, 0), (0, 0), (0, 0), (1, 1)))


def _make_kernel(pack_w: int, hb: int, bcp: int, chans: Sequence[int],
                 pool: str, dtype):
    """Kernel body: 3× (P-build → packed GEMM → bias+ReLU → edge re-zero)
    → sublane-group pool."""
    taps = _taps(pack_w)
    t_n = len(taps)
    cin0, co = chans[0], chans[1]
    mp = PACK_H * pack_w * co

    def stage(src, w_ref, b_ref, b_row, p_scr, dst, r_in, cin, halo, s_id,
              n_strips):
        """One conv: src (2·pack_w·cin rows, r_in·bcp+2 lanes) → dst
        (mp rows, (r_in-2)·bcp+2 lanes)."""
        n = (r_in - 2) * bcp
        for t, (u, v, di, dj, phase) in enumerate(taps):
            start = 1 + (1 + di) * bcp + dj
            p_scr[t * cin:(t + 1) * cin, :n] = (
                src[phase * cin:(phase + 1) * cin, start:start + n])
        acc = jnp.dot(w_ref[:], p_scr[:t_n * cin, :n],
                      preferred_element_type=jnp.float32)
        acc += b_ref[b_row, :].astype(jnp.float32)[:, None]
        acc = jnp.maximum(acc, 0.0)
        # SAME-padding hygiene: zero pad block-cols always, and halo
        # block-rows that fall outside the image on boundary strips.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) + 1
        col = (lane - 1) % bcp
        row = (lane - 1) // bcp
        mask = (col == 0) | (col == bcp - 1)
        if halo > 0:
            mask |= (s_id == 0) & (row < halo)
            mask |= (s_id == n_strips - 1) & (row >= hb + halo)
        acc = jnp.where(mask, 0.0, acc)
        dst[:, 1:1 + n] = acc.astype(dtype)
        dst[:, 0:1] = jnp.zeros((dst.shape[0], 1), dtype)
        dst[:, dst.shape[1] - 1:] = jnp.zeros((dst.shape[0], 1), dtype)

    def kernel(a_ref, w1, w2, w3, b_ref, o_ref, x1, x2, x3, p_scr):
        s_id = pl.program_id(1)
        n_strips = pl.num_programs(1)
        src0 = a_ref[0, 0]
        stage(src0, w1, b_ref, 0, p_scr, x1, hb + 6, cin0, 2, s_id, n_strips)
        stage(x1, w2, b_ref, 1, p_scr, x2, hb + 4, co, 1, s_id, n_strips)
        stage(x2, w3, b_ref, 2, p_scr, x3, hb + 2, co, 0, s_id, n_strips)
        n3 = hb * bcp
        for q in range(pack_w // 2):
            phases = [pr * pack_w + pc
                      for pr in range(PACK_H) for pc in (2 * q, 2 * q + 1)]
            vals = [x3[ph * co:(ph + 1) * co, 1:1 + n3] for ph in phases]
            if pool == "max":
                red = functools.reduce(jnp.maximum, vals)
            else:
                red = sum(v.astype(jnp.float32) for v in vals) / 4.0
            o_ref[0, 0, q * co:(q + 1) * co, :] = red.astype(dtype)

    return kernel


def choose_fused_config(h: int, w: int, cout: int):
    """Pick ``(pack_w, strip_rows)`` for an ``(h, w)`` image and a block of
    width ``cout``, or ``None`` when the fused kernel doesn't apply.

    pack_w targets full MXU rows: 2·pack_w·cout ≥ 128 with the least
    redundancy (9/16-dense 2×2 beats 9/24-dense 2×4 whenever cout alone
    fills 32 sublane-phases).  strip_rows = largest divisor of the
    block-row count ≤ 32 (VMEM budget)."""
    if h % PACK_H:
        return None
    pack_w = 2 if 4 * cout >= 128 else 4
    if w % pack_w:
        pack_w = 2
        if w % pack_w:
            return None
    br = h // PACK_H
    for hb in range(min(32, br), 0, -1):
        if br % hb == 0:
            return pack_w, hb
    return None


def fused_specblock_convpool(x: jnp.ndarray,
                             kernels: Sequence[jnp.ndarray],
                             biases: Sequence[jnp.ndarray],
                             *, pool: str = "max",
                             pack_w: int = 4,
                             strip_rows: int = 25,
                             dtype=jnp.bfloat16,
                             interpret: bool = False) -> jnp.ndarray:
    """conv3x3+ReLU ×3 → 2×2 pool (stride 2, VALID), fused in one Pallas
    program.  ``x`` NHWC; ``kernels`` three HWIO (3,3,·,·) arrays with
    kernels[1:] square in Cout; ``biases`` three (Cout,).  Returns NHWC
    (B, H/2, W/2, Cout).  Not differentiable — use
    :func:`fused_specblock_convpool_vjp` under ``jax.grad``."""
    b, h, w, cin0 = x.shape
    co = kernels[0].shape[-1]
    assert all(k.shape[-1] == co for k in kernels)
    assert kernels[1].shape[2] == co and kernels[2].shape[2] == co
    assert h % (PACK_H * strip_rows) == 0, (h, strip_rows)
    # pool windows pair adjacent phase cols within one block → pack_w even
    assert pack_w % 2 == 0 and w % pack_w == 0, (w, pack_w)
    hb = strip_rows
    br, wb = h // PACK_H, w // pack_w
    s = br // hb
    bcp = wb + 2
    mp = PACK_H * pack_w * co
    t_n = (PACK_H + 2) * (pack_w + 2)
    q_n = pack_w // 2

    strips = _prep_strips(x.astype(dtype), pack_w, hb)
    wps = [pack_conv_weights(k, pack_w).astype(dtype) for k in kernels]
    b_mat = jnp.stack([jnp.tile(bi.astype(jnp.float32), PACK_H * pack_w)
                       for bi in biases])

    kern = _make_kernel(pack_w, hb, bcp, (cin0, co), pool, dtype)
    l0 = (hb + 6) * bcp + 2
    grid = (b, s)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, PACK_H * pack_w * cin0, l0),
                         lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((mp, t_n * cin0), lambda i, j: (0, 0)),
            pl.BlockSpec((mp, t_n * co), lambda i, j: (0, 0)),
            pl.BlockSpec((mp, t_n * co), lambda i, j: (0, 0)),
            pl.BlockSpec((3, mp), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, q_n * co, hb * bcp),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, q_n * co, hb * bcp), dtype),
        scratch_shapes=[
            pltpu.VMEM((mp, (hb + 4) * bcp + 2), dtype),
            pltpu.VMEM((mp, (hb + 2) * bcp + 2), dtype),
            pltpu.VMEM((mp, hb * bcp + 2), dtype),
            pltpu.VMEM((t_n * max(co, cin0), (hb + 4) * bcp), dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * mp * t_n * bcp
            * (cin0 * (hb + 4) + co * (hb + 2) + co * hb),
            bytes_accessed=(strips.size + b * s * q_n * co * hb * bcp) * 2,
            transcendentals=0),
    )(strips, *wps, b_mat)

    out = out.reshape(b, s, q_n, co, hb, bcp)[..., 1:-1]
    out = out.transpose(0, 1, 4, 5, 2, 3).reshape(b, br, wb * q_n, co)
    return out


def _xla_chain_convpool(x, kernels, biases, pool, dtype):
    """The fused kernel's mathematical twin as plain XLA ops (ground truth
    in tests, and the backward rule below)."""
    x = x.astype(dtype)
    for k, b in zip(kernels, biases):
        x = jax.lax.conv_general_dilated(
            x, k.astype(dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        x = jnp.maximum(x + b.astype(jnp.float32), 0.0).astype(dtype)
    init = -jnp.inf if pool == "max" else 0.0
    op = jax.lax.max if pool == "max" else jax.lax.add
    red = jax.lax.reduce_window(x, jnp.asarray(init, x.dtype), op,
                                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return red if pool == "max" else red / 4.0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_convpool_diff(x, kernels, biases, pool, pack_w,
                         strip_rows, dtype, interpret):
    return fused_specblock_convpool(
        x, kernels, biases, pool=pool, pack_w=pack_w,
        strip_rows=strip_rows, dtype=dtype, interpret=interpret)


def _fused_vjp_fwd(x, kernels, biases, pool, pack_w, strip_rows, dtype,
                   interpret):
    out = _fused_convpool_diff(x, kernels, biases, pool, pack_w,
                               strip_rows, dtype, interpret)
    return out, (x, kernels, biases)


def _fused_vjp_bwd(pool, pack_w, strip_rows, dtype, interpret, res, g):
    x, kernels, biases = res
    _, vjp = jax.vjp(
        lambda x_, ks_, bs_: _xla_chain_convpool(x_, ks_, bs_, pool, dtype),
        x, kernels, biases)
    # _xla_chain_convpool's output dtype is always ``dtype`` (each stage
    # ends in .astype(dtype); the pool preserves it).
    return vjp(g.astype(dtype))


_fused_convpool_diff.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_specblock_convpool_vjp(x: jnp.ndarray,
                                 kernels: Sequence[jnp.ndarray],
                                 biases: Sequence[jnp.ndarray],
                                 *, pool: str = "max",
                                 pack_w: int = 4,
                                 strip_rows: int = 25,
                                 dtype=jnp.bfloat16,
                                 interpret: bool = False) -> jnp.ndarray:
    """Differentiable :func:`fused_specblock_convpool`: forward through the
    Pallas kernel, backward through the vjp of the equivalent XLA chain
    (recomputed from the saved primals) — so input-gradient XAI (saliency,
    IG, SHAP) works on a fused-serving model.  In f32 the two functions
    agree to reassociation; in bf16 the backward is the gradient of the
    mathematically identical chain evaluated at the same primals."""
    return _fused_convpool_diff(x, tuple(kernels), tuple(biases), pool,
                                pack_w, strip_rows, dtype, interpret)

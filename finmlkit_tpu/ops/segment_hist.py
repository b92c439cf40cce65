"""Histogram-select per-bar medians: Pallas block histograms + XLA combine.

The third-generation device median engine (BENCH_NOTES round-3 addendum's
"Pallas block-histogram with an XLA-side combine"). Selects the per-bar
median brackets of positive float32 amounts by 4-bit radix refinement on
their ORDER-PRESERVING BIT PATTERNS (positive floats have the sign bit
clear, so the raw bits are a nonnegative int32 order key — same invariant
as ops/segment_select.py), with all heavy work in streaming Pallas passes:

- 8 passes, shifts s = 28,24,...,0. Each pass runs ONE Pallas kernel over
  the trade planes computing, per 128-lane row, the running counts of the
  16 buckets ``(bits - B[bar]) >> s`` (B = per-bar refinement base,
  last-filled from scattered bar-open marks inside the kernel) — per-ROW
  tails only, no full-plane histograms and NO scatter into a
  (bar, bucket) table (whose 39M variable-index updates hit XLA's serial
  scatter path at ~11 ns each — the radix-select engine's downfall).
- An XLA fixup reconstructs exact prefix counts at the ~n_bars boundary
  positions from rowtail[p>>7 - 1] plus an in-row masked reduction
  (same pattern as bar/fused._boundary_state).
- Tiny (n_bars, 16) XLA ops pick each bar's bucket and refine (B, k).
- One final "less" pass (count + segmented max of values strictly below
  the selected upper-middle) resolves the lower-middle bracket exactly
  under duplicate ties: med_a = max_less when the bar has an even count
  and exactly k values below the selected value, else med_a = med_b.

Reference semantics: np.median brackets per bar over ``(ci[i], ci[i+1]]``
(comp_bar_ohlcv, /root/reference/finmlkit/bar/base.py:306-407). Exact:
selection on bit patterns is selection on values.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_scan import (LANES, ROWS, _c_last, _c_or, _c_seg_max, _c_sum,
                         _scan2d)

_I32MIN = np.int32(-2147483647 - 1)
_NB = 16  # buckets per pass (4 bits)
_SHIFTS = (28, 24, 20, 16, 12, 8, 4, 0)

# rowtail lane layout: 16 running bucket counts, then the B-fill value.
# The carry between grid steps is simply the previous block's LAST output
# row, held in a (1, LANES) VMEM scratch.
_S_CNT = 0
_S_B = 16


def _row_prefix(x):
    """Inclusive prefix over rows of an (R, C) block (C <= LANES)."""
    r = x.shape[0]
    shift = 1
    while shift < r:
        x = x + jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) >= shift,
            pltpu.roll(x, np.int32(shift), 0), jnp.zeros_like(x))
        shift *= 2
    return x


def _hist_kernel(s_ref, bits_ref, bscat_ref, flags_ref, out_ref, carry, cb):
    i = pl.program_id(0)
    first = i == 0
    z = jnp.zeros((), jnp.int32)
    s = s_ref[0, 0]

    bits = bits_ref[...]
    bscat = bscat_ref[...]
    flags = flags_ref[...]
    valid = (flags & 1) != 0
    mark = (flags & 2) != 0
    mark32 = mark.astype(jnp.int32)

    (seen,) = _scan2d((mark32,), _c_or)
    seen_b = seen != 0

    bfill, _ = _scan2d((jnp.where(mark, bscat, z), mark32), _c_last)
    carry_b = jnp.where(first, z, cb[0, 0])
    bfill = jnp.where(seen_b, bfill, carry_b)
    cb[0, 0] = bfill[ROWS - 1, LANES - 1]

    rel = bits - bfill
    bucket = rel >> s
    inr = valid & (bucket >= 0) & (bucket < _NB)

    cols = []
    for j in range(_NB):
        cj = jnp.sum(jnp.where(inr & (bucket == np.int32(j)),
                               np.int32(1), z), axis=1, keepdims=True,
                     dtype=jnp.int32)
        cols.append(cj)
    counts = jnp.concatenate(cols, axis=1)          # (ROWS, 16) per-row
    carry_c = jnp.where(first, jnp.zeros((1, _NB), jnp.int32), carry[...])
    run = _row_prefix(counts) + carry_c              # global running
    carry[...] = run[ROWS - 1:ROWS, :]

    pad = jnp.zeros((ROWS, LANES - _NB - 1), jnp.int32)
    out_ref[...] = jnp.concatenate(
        [run, bfill[:, LANES - 1:LANES], pad], axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def _hist_pass(s, bits, bscat, flags, interpret: bool = False):
    """One histogram pass; returns (n_rows, 128) rowtails:
    lanes 0..15 running bucket counts, lane 16 the B-fill row tail."""
    n_rows = bits.shape[0]
    grid = (n_rows // ROWS,)
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, np.int32(0)))
    return pl.pallas_call(
        _hist_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1),
                               lambda i: (np.int32(0), np.int32(0)),
                               memory_space=pltpu.SMEM),
                  spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(bits.shape, jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, _NB), jnp.int32),
                        pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(s, jnp.int32).reshape(1, 1), bits, bscat, flags)


def _less_kernel(bits_ref, vscat_ref, flags_ref, out_ref, c32):
    """Count-prefix and segmented max of values strictly below the per-bar
    selected value (last-filled from vscat). Output lanes: 0 cnt, 1 segmax,
    2 v-fill tail."""
    i = pl.program_id(0)
    first = i == 0
    z = jnp.zeros((), jnp.int32)
    last = (ROWS - 1, LANES - 1)

    bits = bits_ref[...]
    vscat = vscat_ref[...]
    flags = flags_ref[...]
    valid = (flags & 1) != 0
    mark = (flags & 2) != 0
    mark32 = mark.astype(jnp.int32)

    (seen,) = _scan2d((mark32,), _c_or)
    seen_b = seen != 0

    vfill, _ = _scan2d((jnp.where(mark, vscat, z), mark32), _c_last)
    vfill = jnp.where(seen_b, vfill, jnp.where(first, z, c32[0, 2]))
    c32[0, 2] = vfill[last]

    less = valid & (bits < vfill)
    (cnt,) = _scan2d((less.astype(jnp.int32),), _c_sum)
    cnt = cnt + jnp.where(first, z, c32[0, 0])
    c32[0, 0] = cnt[last]

    mx, _ = _scan2d((jnp.where(less, bits, _I32MIN), mark32), _c_seg_max)
    mx = jnp.where(seen_b, mx,
                   jnp.maximum(mx, jnp.where(first, _I32MIN, c32[0, 1])))
    c32[0, 1] = mx[last]

    t = LANES - 1
    pad = jnp.zeros((ROWS, LANES - 3), jnp.int32)
    out_ref[...] = jnp.concatenate(
        [cnt[:, t:], mx[:, t:], vfill[:, t:], pad], axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def _less_pass(bits, vscat, flags, interpret: bool = False):
    n_rows = bits.shape[0]
    grid = (n_rows // ROWS,)
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, np.int32(0)))
    return pl.pallas_call(
        _less_kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(bits.shape, jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 3), jnp.int32)],
        interpret=interpret,
    )(bits, vscat, flags)


# ---------------------------------------------------------------------------
# XLA fixups: exact values at boundary positions from per-row tails
# ---------------------------------------------------------------------------

def _lane_ctx(flags_p, pos):
    """Shared per-position lane context: row ids, lane masks, marks."""
    r = (pos >> 7).astype(jnp.int32)
    l = (pos & 127).astype(jnp.int32)
    iota = jnp.arange(128, dtype=jnp.int32)[None, :]
    flags = flags_p[r]
    valid = (flags & 1) != 0
    mark = (flags & 2) != 0
    le = iota <= l[:, None]
    # last-mark index at or before each lane (running max via log-shifts;
    # XLA's cummax lowering compiles pathologically on this TPU)
    lm_lane = jnp.where(mark, iota, jnp.int32(-1))
    for sh in (1, 2, 4, 8, 16, 32, 64):
        lm_lane = jnp.maximum(
            lm_lane, jnp.where(iota >= sh, jnp.roll(lm_lane, sh, axis=1),
                               jnp.int32(-1)))
    return r, l, iota, valid, mark, le, lm_lane


def _fill_lane(scat_rows, lm_lane, s_carry):
    """Per-lane last-fill value: scat at the last mark <= lane, else the
    carried row-start value."""
    at = jnp.take_along_axis(scat_rows, jnp.maximum(lm_lane, 0), axis=1)
    return jnp.where(lm_lane >= 0, at, s_carry[:, None])


def _hist_fix(rowtail, bits_p, bscat_p, flags_p, pos, s):
    """Prefix bucket counts (n_pos, 16) at positions ``pos``."""
    r, l, iota, valid, mark, le, lm_lane = _lane_ctx(flags_p, pos)
    S = rowtail[jnp.maximum(r - 1, 0)]
    S = jnp.where((r == 0)[:, None], jnp.zeros((128,), jnp.int32)[None], S)
    bfill = _fill_lane(bscat_p[r], lm_lane, S[:, _S_B])
    bucket = (bits_p[r] - bfill) >> s
    inr = valid & (bucket >= 0) & (bucket < _NB) & le
    cols = [jnp.sum(jnp.where(inr & (bucket == np.int32(j)),
                              np.int32(1), np.int32(0)),
                    axis=1, dtype=jnp.int32) for j in range(_NB)]
    return S[:, _S_CNT:_S_CNT + _NB] + jnp.stack(cols, axis=1)


def _less_fix(rowtail, bits_p, vscat_p, flags_p, pos):
    """(cnt_less, segmax_less) at positions ``pos``."""
    r, l, iota, valid, mark, le, lm_lane = _lane_ctx(flags_p, pos)
    S = rowtail[jnp.maximum(r - 1, 0)]
    init = jnp.zeros((128,), jnp.int32).at[1].set(_I32MIN)
    S = jnp.where((r == 0)[:, None], init[None], S)
    vfill = _fill_lane(vscat_p[r], lm_lane, S[:, 2])
    bits = bits_p[r]
    less = valid & (bits < vfill)
    cnt = S[:, 0] + jnp.sum(jnp.where(less & le, np.int32(1), np.int32(0)),
                            axis=1, dtype=jnp.int32)
    # segmented max: reset at the last bar-open mark <= l
    any_mark = jnp.any(mark & le, axis=1)
    seg = (iota >= jnp.maximum(
        jnp.max(jnp.where(mark & le, iota, jnp.int32(-1)), axis=1),
        0)[:, None]) & le
    red = jnp.max(jnp.where(seg & less, bits, _I32MIN), axis=1)
    mx = jnp.where(any_mark, red, jnp.maximum(S[:, 1], red))
    return cnt, mx


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _n_rows(n: int) -> int:
    from .fused_scan import BLOCK
    return ((n + BLOCK - 1) // BLOCK) * (BLOCK // 128)


@partial(jax.jit, static_argnames=("n_pad", "interpret"))
def _median_hist_whole_jit(ci, amounts_f32, n_pad: int, interpret: bool):
    n = amounts_f32.shape[0]
    n_bars = ci.shape[0] - 1
    pad = n_pad - n
    amounts_pad = jnp.concatenate(
        [amounts_f32, jnp.zeros((pad,), jnp.float32)]) if pad else amounts_f32
    bits_flat = jax.lax.bitcast_convert_type(amounts_pad, jnp.int32)
    bits_p = bits_flat.reshape(-1, 128)

    # flags plane: same open-mark/validity convention as bar/fused.py
    idx = jnp.arange(n_pad, dtype=jnp.int64)
    valid = (idx > ci[0]) & (idx <= ci[-1])
    mpos = jnp.clip(ci + 1, 0, n_pad)
    mpos = jnp.where(ci + 1 < n, mpos, n_pad)
    marks = jnp.zeros((n_pad + 1,), jnp.int32).at[mpos].set(1)[:n_pad]
    flags_flat = valid.astype(jnp.int32) | (marks << 1)
    flags_p = flags_flat.reshape(-1, 128)

    # per-bar scatter positions: only the (unique) open position of a
    # NON-EMPTY bar writes; empty bars never need a base
    counts = jnp.diff(ci)
    open_raw = ci[:-1] + 1
    open_ok = (counts > 0) & (open_raw < n) & (open_raw >= 0)
    open_pos = jnp.where(open_ok, jnp.clip(open_raw, 0, n_pad), n_pad)

    def scat_plane(vals):
        return jnp.zeros((n_pad + 1,), jnp.int32).at[open_pos].set(
            vals)[:n_pad].reshape(-1, 128)

    n_elems = n_pad
    e = jnp.clip(ci[1:], 0, n_elems - 1).astype(jnp.int32)
    a0 = jnp.clip(ci[0], 0, n_elems - 1).astype(jnp.int32)
    pos = jnp.concatenate([e, a0[None]])
    have_a0 = ci[0] >= 0

    def bar_hist(H):
        He = H[:-1]
        start = jnp.concatenate(
            [jnp.where(have_a0, H[-1], jnp.zeros((_NB,), jnp.int32))[None],
             He[:-1]])
        return He - start

    k = (counts.astype(jnp.int32)) // 2          # upper-middle rank
    B = jnp.zeros((n_bars,), jnp.int32)
    for s in _SHIFTS:
        bscat = scat_plane(B)
        rt = _hist_pass(s, bits_p, bscat, flags_p, interpret=interpret)
        H = bar_hist(_hist_fix(rt, bits_p, bscat, flags_p, pos, s))
        # 16-wide inclusive prefix via log-shifts (XLA's cumsum lowering
        # compiles pathologically on this TPU at any size)
        cum = H
        jt = jnp.arange(_NB, dtype=jnp.int32)[None, :]
        for sh in (1, 2, 4, 8):
            cum = cum + jnp.where(jt >= sh, jnp.roll(cum, sh, axis=1), 0)
        bsel = jnp.sum((cum <= k[:, None]).astype(jnp.int32), axis=1,
                       dtype=jnp.int32)
        bsel = jnp.minimum(bsel, np.int32(_NB - 1))
        cum_excl = jnp.concatenate(
            [jnp.zeros((n_bars, 1), jnp.int32), cum[:, :-1]], axis=1)
        before = jnp.take_along_axis(cum_excl, bsel[:, None], axis=1)[:, 0]
        k = jnp.maximum(k - before, 0)
        B = B + (bsel << s)

    vb = B  # bit pattern of the (c//2)-th smallest per bar
    vscat = scat_plane(vb)
    lt = _less_pass(bits_p, vscat, flags_p, interpret=interpret)
    cnt_less, max_less = _less_fix(lt, bits_p, vscat, flags_p, pos)
    cnt_bar = cnt_less[:-1] - jnp.concatenate(
        [jnp.where(have_a0, cnt_less[-1], 0)[None], cnt_less[:-2]])
    max_bar = max_less[:-1]

    even = (counts % 2) == 0
    k2 = counts.astype(jnp.int32) // 2
    a_bits = jnp.where(even & (cnt_bar == k2) & (counts > 0), max_bar, vb)
    med_a = jax.lax.bitcast_convert_type(a_bits, jnp.float32)
    med_b = jax.lax.bitcast_convert_type(vb, jnp.float32)
    return med_a, med_b


def segment_median_pair_hist(amounts_f32, ci, interpret: bool = False):
    """Per-bar np.median brackets via histogram select (one jit).

    Requires nonnegative float32 amounts. Empty bars return garbage —
    callers mask on the trade count (as the fused converter does).
    """
    n = int(amounts_f32.shape[0])
    n_pad = _n_rows(n) * 128
    return _median_hist_whole_jit(ci, amounts_f32, n_pad, interpret)

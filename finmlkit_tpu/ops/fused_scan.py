"""Fused single-pass bar-aggregation scan kernel.

One Pallas kernel computes, in a single sequential pass over the trade
axis, every per-trade running quantity that the OHLCV + directional bar
products need (reference per-bar loops: comp_bar_ohlcv at
/root/reference/finmlkit/bar/base.py:306-407 and
comp_bar_directional_features at bar/base.py:409-546):

- inclusive prefix sums (int64 as exact hi/lo int32 pairs) of buy/sell
  volume units and buy/sell dollar units;
- inclusive prefix sums (int32) of buy ticks, sell ticks and spread;
- per-bar *segmented* running extrema, reset at bar-open marks: price
  high/low, max spread, and the running in-bar cumulative tick /
  volume / dollar imbalance min/max.

Everything lives on 1-D trade planes reshaped to ``(rows, 128)`` —
measured on this TPU, ``(C, n)`` row-stacked layouts execute ~200x
slower than flat planes (the round-1 pipeline's core mistake), while a
single-plane Pallas scan runs at memory speed. Downstream consumers
gather the 20 output planes at the ~n_bars bar-boundary positions only.

Precision: int64 prefix sums and all int32 quantities (high/low ticks,
spread, tick-imbalance extrema) are exact. The in-bar volume/dollar
imbalance extrema are computed from the exact pair prefixes but
*compared and stored* as float32 — their public outputs are float32
anyway, so only the final rounding differs (<=1 ulp) from the f64
reference path.

The plain int32 prefix sums (buy/sell tick counts, spread ticks) may
exceed 2^31 over a long month and wrap — that is fine BY DESIGN: two's
complement addition is exact mod 2^32, consumers only ever use per-bar
*differences* of these prefixes (``end - start`` computed in int32
before any widening, see bar/fused.py rsum_i32), and a difference is
exact whenever the true per-bar sum is < 2^31 (a single bar with >2^31
spread ticks or trades is physically implausible; the per-trade inputs
are int32 to begin with). The in-bar rel_ct / base-fill subtractions
are differences within one bar for the same reason.
"""
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# 256*128 = 32768 trades per grid step: 32 in/out planes * 128KB * double
# buffering stays inside the 16MB scoped-VMEM limit (512 rows OOMs)
ROWS = 256
BLOCK = ROWS * LANES

_BIAS = np.int32(-2147483648)  # unsigned compare via sign-bit flip
_I32MIN = np.int32(-2147483647 - 1)
_I32MAX = np.int32(2147483647)
_F32BIG = np.float32(3.0e38)


def _ge(shape, axis, shift):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis) >= shift


def _roll(y, shift, axis):
    return pltpu.roll(y, np.int32(shift), axis)


def _scan2d(xs, combine):
    """Inclusive row-major scan of one or more (R, L) blocks under an
    associative ``combine((a1, ...), (b1, ...))`` operator (a earlier,
    b later). Log-shift scan along lanes, then a log-shift scan of row
    totals down the sublanes, then the row carry is combined into every
    element.
    """
    r, l = xs[0].shape

    def step(ys, shift, axis):
        shifted = tuple(_roll(y, shift, axis) for y in ys)
        mask = _ge(ys[0].shape, axis, shift)
        comb = combine(shifted, ys)
        return tuple(jnp.where(mask, c, y) for c, y in zip(comb, ys))

    ys = xs
    shift = 1
    while shift < l:
        ys = step(ys, shift, 1)
        shift *= 2
    zs = tuple(y[:, l - 1:l] for y in ys)  # (r, 1) inclusive row totals
    shift = 1
    while shift < r:
        zs = step(zs, shift, 0)
        shift *= 2
    # exclusive row prefix = scanned totals shifted down one row
    carry = tuple(_roll(z, 1, 0) for z in zs)
    not_first_row = _ge((r, 1), 0, 1)
    comb = combine(carry, ys)
    return tuple(jnp.where(jnp.broadcast_to(not_first_row, y.shape), c, y)
                 for c, y in zip(comb, ys))


# -- combine operators --------------------------------------------------------

def _c_sum(a, b):
    return (a[0] + b[0],)


def _c_sum_pair(a, b):
    """Exact int64 addition on (hi, lo) int32 pairs."""
    lo = a[1] + b[1]
    ovf = ((lo + _BIAS) < (b[1] + _BIAS)).astype(jnp.int32)
    return (a[0] + b[0] + ovf, lo)


def _c_or(a, b):
    return (a[0] | b[0],)


def _c_last(a, b):
    """Last-fill of (value, flag): value at the latest set flag."""
    return (jnp.where(b[1] != 0, b[0], a[0]), a[1] | b[1])


def _c_last_pair(a, b):
    keep = b[2] != 0
    return (jnp.where(keep, b[0], a[0]), jnp.where(keep, b[1], a[1]),
            a[2] | b[2])


def _c_seg_max(a, b):
    return (jnp.where(b[1] != 0, b[0], jnp.maximum(a[0], b[0])), a[1] | b[1])


def _c_seg_min(a, b):
    return (jnp.where(b[1] != 0, b[0], jnp.minimum(a[0], b[0])), a[1] | b[1])


def _pair_sub(hi1, lo1, hi2, lo2):
    """Exact int64 subtract on (hi, lo) int32 pairs."""
    lo = lo1 - lo2
    borrow = ((lo1 + _BIAS) < (lo2 + _BIAS)).astype(jnp.int32)
    return hi1 - hi2 - borrow, lo


def _pair_neg(hi, lo):
    return -hi - (lo != 0).astype(jnp.int32), -lo


def _pair_to_f32(hi, lo):
    """(hi, lo) int64 pair -> float32 (f32-rounded)."""
    # bool->f32 casts recurse in the Mosaic lowering; use a select
    lo_f = lo.astype(jnp.float32) + jnp.where(
        lo < 0, jnp.float32(4294967296.0), jnp.float32(0.0))
    return hi.astype(jnp.float32) * jnp.float32(4294967296.0) + lo_f


# scratch slot layout
_S_PAIRS = 0          # 12 slots: bu, su, bd, sd, tu, td (hi, lo each)
_S_TB, _S_TS, _S_SP = 12, 13, 14
_S_CVB, _S_CDB = 15, 17      # pair bases (2 slots each)
_S_CTB = 19
_S_HIGH, _S_LOW, _S_SPMAX = 20, 21, 22
_S_CTMIN, _S_CTMAX = 23, 24
_N_I32_SLOTS = 25
_SF_CVMIN, _SF_CVMAX, _SF_CDMIN, _SF_CDMAX = 0, 1, 2, 3
_N_F32_SLOTS = 4


def _bar_scan_kernel(ticks_ref, ulo_ref, uhi_ref, dlo_ref, dhi_ref,
                     side_ref, flags_ref, spread_ref,
                     # outputs
                     pbu_hi, pbu_lo, psu_hi, psu_lo,
                     pbd_hi, pbd_lo, psd_hi, psd_lo,
                     ptu_hi, ptu_lo, ptd_hi, ptd_lo,
                     ptb, pts, psp,
                     r_high, r_low, r_spmax, r_ctmin, r_ctmax,
                     r_cvmin, r_cvmax, r_cdmin, r_cdmax,
                     ci32, cf32):
    i = pl.program_id(0)
    first = i == 0
    z = jnp.zeros((), jnp.int32)
    last = (ROWS - 1, LANES - 1)

    ticks = ticks_ref[...]
    ulo = ulo_ref[...]
    uhi = uhi_ref[...]
    dlo = dlo_ref[...]
    dhi = dhi_ref[...]
    side = side_ref[...]
    flags = flags_ref[...]
    spread = spread_ref[...]

    valid = (flags & 1) != 0
    mark = (flags & 2) != 0
    mark32 = mark.astype(jnp.int32)
    is_buy = side == 1
    is_sell = side == -1

    def c32(k):
        return jnp.where(first, z, ci32[0, k])

    # ---- plain prefix sums: (hi, lo) int64 pairs -------------------------
    def pair_prefix(mask, hi_v, lo_v, slot, out_hi, out_lo):
        hi_in = jnp.where(mask, hi_v, z)
        lo_in = jnp.where(mask, lo_v, z)
        hi_s, lo_s = _scan2d((hi_in, lo_in), _c_sum_pair)
        chi, clo = c32(slot), c32(slot + 1)
        lo_f = lo_s + clo
        ovf = ((lo_f + _BIAS) < (lo_s + _BIAS)).astype(jnp.int32)
        hi_f = hi_s + chi + ovf
        out_hi[...] = hi_f
        out_lo[...] = lo_f
        ci32[0, slot] = hi_f[last]
        ci32[0, slot + 1] = lo_f[last]
        return hi_f, lo_f, hi_in, lo_in

    buh, bul, buxh, buxl = pair_prefix(is_buy, uhi, ulo, _S_PAIRS + 0,
                                       pbu_hi, pbu_lo)
    suh, sul, suxh, suxl = pair_prefix(is_sell, uhi, ulo, _S_PAIRS + 2,
                                       psu_hi, psu_lo)
    bdh, bdl, bdxh, bdxl = pair_prefix(is_buy, dhi, dlo, _S_PAIRS + 4,
                                       pbd_hi, pbd_lo)
    sdh, sdl, sdxh, sdxl = pair_prefix(is_sell, dhi, dlo, _S_PAIRS + 6,
                                       psd_hi, psd_lo)
    # totals over ALL valid trades (side 0 included): bar volume/vwap
    pair_prefix(valid, uhi, ulo, _S_PAIRS + 8, ptu_hi, ptu_lo)
    pair_prefix(valid, dhi, dlo, _S_PAIRS + 10, ptd_hi, ptd_lo)

    # ---- plain int32 prefix sums -----------------------------------------
    def i32_prefix(v, slot, out):
        (s,) = _scan2d((v,), _c_sum)
        s = s + c32(slot)
        out[...] = s
        ci32[0, slot] = s[last]
        return s

    tbm = (is_buy & valid).astype(jnp.int32)
    tsm = (is_sell & valid).astype(jnp.int32)
    tb = i32_prefix(tbm, _S_TB, ptb)
    ts_ = i32_prefix(tsm, _S_TS, pts)
    i32_prefix(jnp.where(valid, spread, z), _S_SP, psp)

    # inclusive cum-or of marks within the block: before the block's
    # first mark, carries from previous blocks still apply
    (seen,) = _scan2d((mark32,), _c_or)
    seen_b = seen != 0

    # ---- segmented extrema (reset at bar-open marks) ----------------------
    def seg_max_i32(v, slot, out):
        m, _ = _scan2d((v, mark32), _c_seg_max)
        carry = jnp.where(first, _I32MIN, ci32[0, slot])
        m_f = jnp.where(seen_b, m, jnp.maximum(m, carry))
        out[...] = m_f
        ci32[0, slot] = m_f[last]

    def seg_min_i32(v, slot, out):
        m, _ = _scan2d((v, mark32), _c_seg_min)
        carry = jnp.where(first, _I32MAX, ci32[0, slot])
        m_f = jnp.where(seen_b, m, jnp.minimum(m, carry))
        out[...] = m_f
        ci32[0, slot] = m_f[last]

    def seg_max_f32(v, slot_f, out):
        m, _ = _scan2d((v, mark32), _c_seg_max)
        carry = jnp.where(first, -_F32BIG, cf32[0, slot_f])
        m_f = jnp.where(seen_b, m, jnp.maximum(m, carry))
        out[...] = m_f
        cf32[0, slot_f] = m_f[last]

    def seg_min_f32(v, slot_f, out):
        m, _ = _scan2d((v, mark32), _c_seg_min)
        carry = jnp.where(first, _F32BIG, cf32[0, slot_f])
        m_f = jnp.where(seen_b, m, jnp.minimum(m, carry))
        out[...] = m_f
        cf32[0, slot_f] = m_f[last]

    # NOTE: bare Python int literals inside jnp.where recurse in the
    # Mosaic lowering under x64 (weak int64 constant); use np.int32
    seg_max_i32(jnp.where(valid, ticks, _I32MIN), _S_HIGH, r_high)
    seg_min_i32(jnp.where(valid, ticks, _I32MAX), _S_LOW, r_low)
    seg_max_i32(jnp.where(valid, spread, np.int32(-1)), _S_SPMAX, r_spmax)

    # in-bar running cum imbalances: exact pair prefixes minus the value
    # at the bar open (last-fill of the exclusive prefix at marks)
    def bar_base_pair(hi_s, lo_s, x_hi, x_lo, slot):
        ehi, elo = _pair_sub(hi_s, lo_s, x_hi, x_lo)
        bhi, blo, _ = _scan2d(
            (jnp.where(mark, ehi, z), jnp.where(mark, elo, z), mark32),
            _c_last_pair)
        bhi = jnp.where(seen_b, bhi, c32(slot))
        blo = jnp.where(seen_b, blo, c32(slot + 1))
        ci32[0, slot] = bhi[last]
        ci32[0, slot + 1] = blo[last]
        return bhi, blo

    # cv = cum(side*units) = P_bu - P_su ; cd likewise on dollars
    cv_hi, cv_lo = _pair_sub(buh, bul, suh, sul)
    cd_hi, cd_lo = _pair_sub(bdh, bdl, sdh, sdl)
    # this element's signed contribution (pair): x_bu - x_su
    xu_hi, xu_lo = _pair_sub(buxh, buxl, suxh, suxl)
    xd_hi, xd_lo = _pair_sub(bdxh, bdxl, sdxh, sdxl)

    cvb_hi, cvb_lo = bar_base_pair(cv_hi, cv_lo, xu_hi, xu_lo, _S_CVB)
    cdb_hi, cdb_lo = bar_base_pair(cd_hi, cd_lo, xd_hi, xd_lo, _S_CDB)

    rel_cv = _pair_to_f32(*_pair_sub(cv_hi, cv_lo, cvb_hi, cvb_lo))
    rel_cd = _pair_to_f32(*_pair_sub(cd_hi, cd_lo, cdb_hi, cdb_lo))
    traded = valid & (side != 0)
    seg_min_f32(jnp.where(traded, rel_cv, _F32BIG), _SF_CVMIN, r_cvmin)
    seg_max_f32(jnp.where(traded, rel_cv, -_F32BIG), _SF_CVMAX, r_cvmax)
    seg_min_f32(jnp.where(traded, rel_cd, _F32BIG), _SF_CDMIN, r_cdmin)
    seg_max_f32(jnp.where(traded, rel_cd, -_F32BIG), _SF_CDMAX, r_cdmax)

    # ct = cum ticks imbalance = P_tb - P_ts, base-filled at marks (exact i32)
    ct = tb - ts_
    e_ct = ct - (tbm - tsm)
    ctb, _ = _scan2d((jnp.where(mark, e_ct, z), mark32), _c_last)
    ctb = jnp.where(seen_b, ctb, c32(_S_CTB))
    ci32[0, _S_CTB] = ctb[last]
    rel_ct = ct - ctb
    seg_min_i32(jnp.where(traded, rel_ct, _I32MAX), _S_CTMIN, r_ctmin)
    seg_max_i32(jnp.where(traded, rel_ct, _I32MIN), _S_CTMAX, r_ctmax)


# ---------------------------------------------------------------------------
# Boundary-output variant: per-ROW tail states instead of full planes
# ---------------------------------------------------------------------------
#
# The full-plane kernel above writes 24 planes (~3.7 GB at monthly trade
# counts) that downstream consumers gather at only ~n_bars boundary
# positions. This variant runs the SAME in-block scans but emits one
# (n_rows, 128) int32 plane holding, for every 128-lane row, the running
# value of each quantity at the row's END (lane 127) — 24x less HBM
# write traffic. A small XLA fixup (bar/fused.py:_boundary_state) then
# reconstructs the exact value at any position p from rowtail[p>>7 - 1]
# plus a masked reduction over the gathered input row — no full-plane
# materialization anywhere.
#
# Output lane layout (ROWTAIL_* constants): 12 pair-prefix words, 3 int32
# prefixes, 5 int32 segmented extrema, 4 float32 segmented extrema
# (bitcast to int32), 5 last-fill base words. Lanes 29..127 are zero.

ROWTAIL_LANES = {
    "pbu_hi": 0, "pbu_lo": 1, "psu_hi": 2, "psu_lo": 3,
    "pbd_hi": 4, "pbd_lo": 5, "psd_hi": 6, "psd_lo": 7,
    "ptu_hi": 8, "ptu_lo": 9, "ptd_hi": 10, "ptd_lo": 11,
    "ptb": 12, "pts": 13, "psp": 14,
    "high": 15, "low": 16, "spmax": 17, "ctmin": 18, "ctmax": 19,
    "cvmin": 20, "cvmax": 21, "cdmin": 22, "cdmax": 23,
    "cvb_hi": 24, "cvb_lo": 25, "cdb_hi": 26, "cdb_lo": 27, "ctb": 28,
}
N_ROWTAIL = 29


def _rowtail_kernel(ticks_ref, ulo_ref, uhi_ref, dlo_ref, dhi_ref,
                    side_ref, flags_ref, spread_ref, out_ref, ci32, cf32):
    i = pl.program_id(0)
    first = i == 0
    z = jnp.zeros((), jnp.int32)
    last = (ROWS - 1, LANES - 1)

    ticks = ticks_ref[...]
    ulo = ulo_ref[...]
    uhi = uhi_ref[...]
    dlo = dlo_ref[...]
    dhi = dhi_ref[...]
    side = side_ref[...]
    flags = flags_ref[...]
    spread = spread_ref[...]

    valid = (flags & 1) != 0
    mark = (flags & 2) != 0
    mark32 = mark.astype(jnp.int32)
    is_buy = side == 1
    is_sell = side == -1

    cols = [None] * N_ROWTAIL

    def c32(k):
        return jnp.where(first, z, ci32[0, k])

    def tail(y):
        return y[:, LANES - 1:LANES]

    # ---- plain prefix sums: (hi, lo) int64 pairs -------------------------
    def pair_prefix(mask, hi_v, lo_v, slot, name):
        hi_in = jnp.where(mask, hi_v, z)
        lo_in = jnp.where(mask, lo_v, z)
        hi_s, lo_s = _scan2d((hi_in, lo_in), _c_sum_pair)
        chi, clo = c32(slot), c32(slot + 1)
        lo_f = lo_s + clo
        ovf = ((lo_f + _BIAS) < (lo_s + _BIAS)).astype(jnp.int32)
        hi_f = hi_s + chi + ovf
        cols[ROWTAIL_LANES[name + "_hi"]] = tail(hi_f)
        cols[ROWTAIL_LANES[name + "_lo"]] = tail(lo_f)
        ci32[0, slot] = hi_f[last]
        ci32[0, slot + 1] = lo_f[last]
        return hi_f, lo_f, hi_in, lo_in

    buh, bul, buxh, buxl = pair_prefix(is_buy, uhi, ulo, _S_PAIRS + 0, "pbu")
    suh, sul, suxh, suxl = pair_prefix(is_sell, uhi, ulo, _S_PAIRS + 2, "psu")
    bdh, bdl, bdxh, bdxl = pair_prefix(is_buy, dhi, dlo, _S_PAIRS + 4, "pbd")
    sdh, sdl, sdxh, sdxl = pair_prefix(is_sell, dhi, dlo, _S_PAIRS + 6, "psd")
    pair_prefix(valid, uhi, ulo, _S_PAIRS + 8, "ptu")
    pair_prefix(valid, dhi, dlo, _S_PAIRS + 10, "ptd")

    # ---- plain int32 prefix sums -----------------------------------------
    def i32_prefix(v, slot, name):
        (s,) = _scan2d((v,), _c_sum)
        s = s + c32(slot)
        cols[ROWTAIL_LANES[name]] = tail(s)
        ci32[0, slot] = s[last]
        return s

    tbm = (is_buy & valid).astype(jnp.int32)
    tsm = (is_sell & valid).astype(jnp.int32)
    tb = i32_prefix(tbm, _S_TB, "ptb")
    ts_ = i32_prefix(tsm, _S_TS, "pts")
    i32_prefix(jnp.where(valid, spread, z), _S_SP, "psp")

    (seen,) = _scan2d((mark32,), _c_or)
    seen_b = seen != 0

    # ---- segmented extrema (reset at bar-open marks) ----------------------
    def seg_i32(v, slot, name, is_max):
        m, _ = _scan2d((v, mark32), _c_seg_max if is_max else _c_seg_min)
        init = _I32MIN if is_max else _I32MAX
        carry = jnp.where(first, init, ci32[0, slot])
        comb = jnp.maximum if is_max else jnp.minimum
        m_f = jnp.where(seen_b, m, comb(m, carry))
        cols[ROWTAIL_LANES[name]] = tail(m_f)
        ci32[0, slot] = m_f[last]

    def seg_f32(v, slot_f, name, is_max):
        m, _ = _scan2d((v, mark32), _c_seg_max if is_max else _c_seg_min)
        init = -_F32BIG if is_max else _F32BIG
        carry = jnp.where(first, init, cf32[0, slot_f])
        comb = jnp.maximum if is_max else jnp.minimum
        m_f = jnp.where(seen_b, m, comb(m, carry))
        cols[ROWTAIL_LANES[name]] = jax.lax.bitcast_convert_type(
            tail(m_f), jnp.int32)
        cf32[0, slot_f] = m_f[last]

    seg_i32(jnp.where(valid, ticks, _I32MIN), _S_HIGH, "high", True)
    seg_i32(jnp.where(valid, ticks, _I32MAX), _S_LOW, "low", False)
    seg_i32(jnp.where(valid, spread, np.int32(-1)), _S_SPMAX, "spmax", True)

    # in-bar running cum imbalances: base = exclusive prefix at the last
    # bar-open mark (last-fill), rel = prefix - base
    def bar_base_pair(hi_s, lo_s, x_hi, x_lo, slot, name):
        ehi, elo = _pair_sub(hi_s, lo_s, x_hi, x_lo)
        bhi, blo, _ = _scan2d(
            (jnp.where(mark, ehi, z), jnp.where(mark, elo, z), mark32),
            _c_last_pair)
        bhi = jnp.where(seen_b, bhi, c32(slot))
        blo = jnp.where(seen_b, blo, c32(slot + 1))
        cols[ROWTAIL_LANES[name + "_hi"]] = tail(bhi)
        cols[ROWTAIL_LANES[name + "_lo"]] = tail(blo)
        ci32[0, slot] = bhi[last]
        ci32[0, slot + 1] = blo[last]
        return bhi, blo

    cv_hi, cv_lo = _pair_sub(buh, bul, suh, sul)
    cd_hi, cd_lo = _pair_sub(bdh, bdl, sdh, sdl)
    xu_hi, xu_lo = _pair_sub(buxh, buxl, suxh, suxl)
    xd_hi, xd_lo = _pair_sub(bdxh, bdxl, sdxh, sdxl)

    cvb_hi, cvb_lo = bar_base_pair(cv_hi, cv_lo, xu_hi, xu_lo, _S_CVB, "cvb")
    cdb_hi, cdb_lo = bar_base_pair(cd_hi, cd_lo, xd_hi, xd_lo, _S_CDB, "cdb")

    rel_cv = _pair_to_f32(*_pair_sub(cv_hi, cv_lo, cvb_hi, cvb_lo))
    rel_cd = _pair_to_f32(*_pair_sub(cd_hi, cd_lo, cdb_hi, cdb_lo))
    traded = valid & (side != 0)
    seg_f32(jnp.where(traded, rel_cv, _F32BIG), _SF_CVMIN, "cvmin", False)
    seg_f32(jnp.where(traded, rel_cv, -_F32BIG), _SF_CVMAX, "cvmax", True)
    seg_f32(jnp.where(traded, rel_cd, _F32BIG), _SF_CDMIN, "cdmin", False)
    seg_f32(jnp.where(traded, rel_cd, -_F32BIG), _SF_CDMAX, "cdmax", True)

    ct = tb - ts_
    e_ct = ct - (tbm - tsm)
    ctb, _ = _scan2d((jnp.where(mark, e_ct, z), mark32), _c_last)
    ctb = jnp.where(seen_b, ctb, c32(_S_CTB))
    cols[ROWTAIL_LANES["ctb"]] = tail(ctb)
    ci32[0, _S_CTB] = ctb[last]
    rel_ct = ct - ctb
    seg_i32(jnp.where(traded, rel_ct, _I32MAX), _S_CTMIN, "ctmin", False)
    seg_i32(jnp.where(traded, rel_ct, _I32MIN), _S_CTMAX, "ctmax", True)

    pad = jnp.zeros((ROWS, LANES - N_ROWTAIL), jnp.int32)
    out_ref[...] = jnp.concatenate(cols + [pad], axis=1)


# ---------------------------------------------------------------------------
# v3: batched row phases
# ---------------------------------------------------------------------------
#
# Layout fact (measured): a (ROWS, 1) column op costs the SAME 32 vregs
# as a full (ROWS, 128) op, so the per-quantity ROW phase of _scan2d
# (8 log-steps x ~35 scan arrays) is ~half the kernel's compute despite
# touching 1/128 of the data. v3 runs the lane phases per quantity as
# before, then batches ALL row phases into three (ROWS, 128) tiles whose
# per-lane combine is selected by static lane-class masks (sum /
# seg-max / seg-min / last-fill / or), with ONE shared row-mark flag
# column. Pair (hi, lo) row totals ride three plain sum lanes via a
# 16-bit split (exact carry reconstruction); float32 extrema ride int32
# lanes via the monotone sign-flip encoding. Tiles are staged by data
# dependency: sums + price extrema -> bases -> rel-imbalance extrema.
# Output is BIT-IDENTICAL to bar_scan_rowtails (the parity oracle).

_M16 = np.int32(0xFFFF)


def _lane_scan(xs, combine):
    """Inclusive scan along lanes only; rows independent."""
    l = xs[0].shape[1]
    ys = xs
    shift = 1
    while shift < l:
        shifted = tuple(_roll(y, shift, 1) for y in ys)
        mask = _ge(ys[0].shape, 1, shift)
        comb = combine(shifted, ys)
        ys = tuple(jnp.where(mask, c, y) for c, y in zip(comb, ys))
        shift *= 2
    return ys


def _f32_to_mono_i32(v):
    m = jax.lax.bitcast_convert_type(v, jnp.int32)
    return jnp.where(m >= 0, m, m ^ np.int32(0x7FFFFFFF))


def _mono_i32_to_f32(k):
    m = jnp.where(k >= 0, k, k ^ np.int32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(m, jnp.float32)


def _mk_masks(spec):
    """spec: dict class -> lane indices. Builds (1, LANES) bool masks
    from iota range compares AT TRACE TIME (Pallas rejects captured
    array constants)."""
    io = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def one(idxs):
        if not idxs:
            return jnp.zeros((1, LANES), jnp.bool_)
        idxs = sorted(idxs)
        runs = []
        s = p = idxs[0]
        for x in idxs[1:]:
            if x == p + 1:
                p = x
            else:
                runs.append((s, p))
                s = p = x
        runs.append((s, p))
        m = None
        for a, b in runs:
            mm = (io >= np.int32(a)) & (io <= np.int32(b))
            m = mm if m is None else (m | mm)
        return m

    return {cls: one(list(spec.get(cls, ())))
            for cls in ("sum", "max", "min", "fill")}


def _row_scan_tiled(T, flag_lane: int, classes):
    """Inclusive row scan of a (ROWS, LANES) tile; per-lane combine by
    the class masks from :func:`_mk_masks`; every other lane or-combines
    (the flag lane and padding)."""
    r = T.shape[0]
    msum, mmax = classes["sum"], classes["max"]
    mmin, mfill = classes["min"], classes["fill"]
    shift = 1
    while shift < r:
        Tsh = _roll(T, shift, 0)
        rows_ok = _ge(T.shape, 0, shift)
        fcur = T[:, flag_lane:flag_lane + 1] != 0
        summ = Tsh + T
        mx = jnp.where(fcur, T, jnp.maximum(Tsh, T))
        mn = jnp.where(fcur, T, jnp.minimum(Tsh, T))
        fill = jnp.where(fcur, T, Tsh)
        orr = Tsh | T
        comb = jnp.where(msum, summ,
                         jnp.where(mmax, mx,
                                   jnp.where(mmin, mn,
                                             jnp.where(mfill, fill, orr))))
        T = jnp.where(rows_ok, comb, T)
        shift *= 2
    return T


# tile-1 lane plan: 18 pair-split sum lanes + tb/ts/sp + price extrema
_T1_FLAG = 24
_T1_SPEC = {"sum": list(range(21)), "max": [21, 23], "min": [22]}
# tile-2: the five last-fill base lanes
_T2_FLAG = 5
_T2_SPEC = {"fill": [0, 1, 2, 3, 4]}
# tile-3: the six in-bar imbalance extremum lanes
_T3_FLAG = 6
_T3_SPEC = {"min": [0, 2, 4], "max": [1, 3, 5]}


def _rowtail_kernel_v3(ticks_ref, ulo_ref, uhi_ref, dlo_ref, dhi_ref,
                       side_ref, flags_ref, spread_ref, out_ref, ci32, cf32):
    i = pl.program_id(0)
    first = i == 0
    z = jnp.zeros((), jnp.int32)
    last = (ROWS - 1, LANES - 1)

    ticks = ticks_ref[...]
    ulo = ulo_ref[...]
    uhi = uhi_ref[...]
    dlo = dlo_ref[...]
    dhi = dhi_ref[...]
    side = side_ref[...]
    flags = flags_ref[...]
    spread = spread_ref[...]

    valid = (flags & 1) != 0
    mark = (flags & 2) != 0
    mark32 = mark.astype(jnp.int32)
    is_buy = side == 1
    is_sell = side == -1

    row0 = ~_ge((ROWS, 1), 0, 1)        # (ROWS, 1) True on row 0
    cols = [None] * N_ROWTAIL

    def c32(k):
        return jnp.where(first, z, ci32[0, k])

    def tail(y):
        return y[:, LANES - 1:LANES]

    def col1(E, k):
        return jnp.where(row0, z, E[:, k:k + 1])

    # shared within-row cumulative mark
    (seenL32,) = _lane_scan((mark32,), _c_or)
    seenL = seenL32 != 0
    rowmark = tail(seenL32)

    # ---- lane phases: sums + price extrema ---------------------------
    def pair_lane(mask, hi_v, lo_v):
        hi_in = jnp.where(mask, hi_v, z)
        lo_in = jnp.where(mask, lo_v, z)
        hi_s, lo_s = _lane_scan((hi_in, lo_in), _c_sum_pair)
        return hi_s, lo_s, hi_in, lo_in

    pq = [("pbu", pair_lane(is_buy, uhi, ulo)),
          ("psu", pair_lane(is_sell, uhi, ulo)),
          ("pbd", pair_lane(is_buy, dhi, dlo)),
          ("psd", pair_lane(is_sell, dhi, dlo)),
          ("ptu", pair_lane(valid, uhi, ulo)),
          ("ptd", pair_lane(valid, dhi, dlo))]
    tbm = (is_buy & valid).astype(jnp.int32)
    tsm = (is_sell & valid).astype(jnp.int32)
    (tb_r,) = _lane_scan((tbm,), _c_sum)
    (ts_r,) = _lane_scan((tsm,), _c_sum)
    (sp_r,) = _lane_scan((jnp.where(valid, spread, z),), _c_sum)
    hgh_r, _ = _lane_scan((jnp.where(valid, ticks, _I32MIN), mark32),
                          _c_seg_max)
    low_r, _ = _lane_scan((jnp.where(valid, ticks, _I32MAX), mark32),
                          _c_seg_min)
    spx_r, _ = _lane_scan((jnp.where(valid, spread, np.int32(-1)), mark32),
                          _c_seg_max)

    # ---- tile 1 row scan ---------------------------------------------
    t1 = []
    for _, (hi_s, lo_s, _, _) in pq:
        lo_t = tail(lo_s)
        t1 += [lo_t & _M16, (lo_t >> 16) & _M16, tail(hi_s)]
    t1 += [tail(tb_r), tail(ts_r), tail(sp_r),
           tail(hgh_r), tail(low_r), tail(spx_r), rowmark]
    T1 = jnp.concatenate(
        t1 + [jnp.zeros((ROWS, LANES - len(t1)), jnp.int32)], axis=1)
    E1 = _roll(_row_scan_tiled(T1, _T1_FLAG, _mk_masks(_T1_SPEC)),
               1, 0)
    e1flag = col1(E1, _T1_FLAG) != 0
    seenB = seenL | jnp.broadcast_to(e1flag, seenL.shape)

    # ---- apply: pairs -------------------------------------------------
    def pair_apply(qi, slot, hi_s, lo_s):
        A = col1(E1, 3 * qi)
        B = col1(E1, 3 * qi + 1)
        H = col1(E1, 3 * qi + 2)
        mid = B + (A >> 16)
        lo_p = ((mid & _M16) << 16) | (A & _M16)
        hi_p = H + (mid >> 16)
        clo, chi = c32(slot + 1), c32(slot)
        lo_pc = lo_p + clo
        ovf_c = ((lo_pc + _BIAS) < (lo_p + _BIAS)).astype(jnp.int32)
        hi_pc = hi_p + chi + ovf_c
        lo_f = lo_s + lo_pc
        ovf = ((lo_f + _BIAS) < (lo_s + _BIAS)).astype(jnp.int32)
        hi_f = hi_s + hi_pc + ovf
        return hi_f, lo_f

    pf = {}
    for qi, (name, (hi_s, lo_s, hx, lx)) in enumerate(pq):
        slot = _S_PAIRS + 2 * qi
        hi_f, lo_f = pair_apply(qi, slot, hi_s, lo_s)
        cols[ROWTAIL_LANES[name + "_hi"]] = tail(hi_f)
        cols[ROWTAIL_LANES[name + "_lo"]] = tail(lo_f)
        ci32[0, slot] = hi_f[last]
        ci32[0, slot + 1] = lo_f[last]
        pf[name] = (hi_f, lo_f, hx, lx)

    # ---- apply: plain i32 sums ----------------------------------------
    def i32_apply(y, lane, slot, name):
        s = y + (col1(E1, lane) + c32(slot))
        cols[ROWTAIL_LANES[name]] = tail(s)
        ci32[0, slot] = s[last]
        return s

    tb = i32_apply(tb_r, 18, _S_TB, "ptb")
    ts_ = i32_apply(ts_r, 19, _S_TS, "pts")
    i32_apply(sp_r, 20, _S_SP, "psp")

    # ---- apply: segmented extrema -------------------------------------
    def seg_apply_i32(y, Ecol, slot, name, is_max):
        ident = _I32MIN if is_max else _I32MAX
        comb = jnp.maximum if is_max else jnp.minimum
        Ee = jnp.where(row0, ident, Ecol)
        m1 = jnp.where(seenL, y, comb(y, Ee))
        carry = jnp.where(first, ident, ci32[0, slot])
        m_f = jnp.where(seenB, m1, comb(m1, carry))
        cols[ROWTAIL_LANES[name]] = tail(m_f)
        ci32[0, slot] = m_f[last]

    seg_apply_i32(hgh_r, E1[:, 21:22], _S_HIGH, "high", True)
    seg_apply_i32(low_r, E1[:, 22:23], _S_LOW, "low", False)
    seg_apply_i32(spx_r, E1[:, 23:24], _S_SPMAX, "spmax", True)

    # ---- bases: lane fills + tile 2 -----------------------------------
    cv_hi, cv_lo = _pair_sub(pf["pbu"][0], pf["pbu"][1],
                             pf["psu"][0], pf["psu"][1])
    cd_hi, cd_lo = _pair_sub(pf["pbd"][0], pf["pbd"][1],
                             pf["psd"][0], pf["psd"][1])
    xu_hi, xu_lo = _pair_sub(pf["pbu"][2], pf["pbu"][3],
                             pf["psu"][2], pf["psu"][3])
    xd_hi, xd_lo = _pair_sub(pf["pbd"][2], pf["pbd"][3],
                             pf["psd"][2], pf["psd"][3])
    ecv_hi, ecv_lo = _pair_sub(cv_hi, cv_lo, xu_hi, xu_lo)
    ecd_hi, ecd_lo = _pair_sub(cd_hi, cd_lo, xd_hi, xd_lo)
    ct = tb - ts_
    e_ct = ct - (tbm - tsm)

    bvh_r, bvl_r, _ = _lane_scan(
        (jnp.where(mark, ecv_hi, z), jnp.where(mark, ecv_lo, z), mark32),
        _c_last_pair)
    bdh_r, bdl_r, _ = _lane_scan(
        (jnp.where(mark, ecd_hi, z), jnp.where(mark, ecd_lo, z), mark32),
        _c_last_pair)
    bct_r, _ = _lane_scan((jnp.where(mark, e_ct, z), mark32), _c_last)

    t2 = [tail(bvh_r), tail(bvl_r), tail(bdh_r), tail(bdl_r),
          tail(bct_r), rowmark]
    T2 = jnp.concatenate(
        t2 + [jnp.zeros((ROWS, LANES - len(t2)), jnp.int32)], axis=1)
    E2 = _roll(_row_scan_tiled(T2, _T2_FLAG, _mk_masks(_T2_SPEC)),
               1, 0)

    def fill_apply(y, lane, slot, name):
        b1 = jnp.where(seenL, y,
                       jnp.where(jnp.broadcast_to(e1flag, y.shape),
                                 col1(E2, lane), c32(slot)))
        if name is not None:
            cols[ROWTAIL_LANES[name]] = tail(b1)
        ci32[0, slot] = b1[last]
        return b1

    bvh = fill_apply(bvh_r, 0, _S_CVB, "cvb_hi")
    bvl = fill_apply(bvl_r, 1, _S_CVB + 1, "cvb_lo")
    bdh = fill_apply(bdh_r, 2, _S_CDB, "cdb_hi")
    bdl = fill_apply(bdl_r, 3, _S_CDB + 1, "cdb_lo")
    bct = fill_apply(bct_r, 4, _S_CTB, "ctb")

    # ---- rel-imbalance extrema: lane phase + tile 3 -------------------
    rel_cv = _pair_to_f32(*_pair_sub(cv_hi, cv_lo, bvh, bvl))
    rel_cd = _pair_to_f32(*_pair_sub(cd_hi, cd_lo, bdh, bdl))
    traded = valid & (side != 0)
    rel_ct = ct - bct

    ctmin_r, _ = _lane_scan((jnp.where(traded, rel_ct, _I32MAX), mark32),
                            _c_seg_min)
    ctmax_r, _ = _lane_scan((jnp.where(traded, rel_ct, _I32MIN), mark32),
                            _c_seg_max)
    cvmin_r, _ = _lane_scan((jnp.where(traded, rel_cv, _F32BIG), mark32),
                            _c_seg_min)
    cvmax_r, _ = _lane_scan((jnp.where(traded, rel_cv, -_F32BIG), mark32),
                            _c_seg_max)
    cdmin_r, _ = _lane_scan((jnp.where(traded, rel_cd, _F32BIG), mark32),
                            _c_seg_min)
    cdmax_r, _ = _lane_scan((jnp.where(traded, rel_cd, -_F32BIG), mark32),
                            _c_seg_max)

    t3 = [tail(ctmin_r), tail(ctmax_r),
          _f32_to_mono_i32(tail(cvmin_r)), _f32_to_mono_i32(tail(cvmax_r)),
          _f32_to_mono_i32(tail(cdmin_r)), _f32_to_mono_i32(tail(cdmax_r)),
          rowmark]
    T3 = jnp.concatenate(
        t3 + [jnp.zeros((ROWS, LANES - len(t3)), jnp.int32)], axis=1)
    E3 = _roll(_row_scan_tiled(T3, _T3_FLAG, _mk_masks(_T3_SPEC)),
               1, 0)

    seg_apply_i32(ctmin_r, E3[:, 0:1], _S_CTMIN, "ctmin", False)
    seg_apply_i32(ctmax_r, E3[:, 1:2], _S_CTMAX, "ctmax", True)

    def seg_apply_f32(y, lane, slot_f, name, is_max):
        ident = -_F32BIG if is_max else _F32BIG
        comb = jnp.maximum if is_max else jnp.minimum
        Ee = jnp.where(row0, jnp.float32(ident),
                       _mono_i32_to_f32(E3[:, lane:lane + 1]))
        m1 = jnp.where(seenL, y, comb(y, Ee))
        carry = jnp.where(first, ident, cf32[0, slot_f])
        m_f = jnp.where(seenB, m1, comb(m1, carry))
        cols[ROWTAIL_LANES[name]] = jax.lax.bitcast_convert_type(
            tail(m_f), jnp.int32)
        cf32[0, slot_f] = m_f[last]

    seg_apply_f32(cvmin_r, 2, _SF_CVMIN, "cvmin", False)
    seg_apply_f32(cvmax_r, 3, _SF_CVMAX, "cvmax", True)
    seg_apply_f32(cdmin_r, 4, _SF_CDMIN, "cdmin", False)
    seg_apply_f32(cdmax_r, 5, _SF_CDMAX, "cdmax", True)

    pad = jnp.zeros((ROWS, LANES - N_ROWTAIL), jnp.int32)
    out_ref[...] = jnp.concatenate(cols + [pad], axis=1)


# ---------------------------------------------------------------------------
# v4: MXU-offloaded lane phases — reduce, don't scan, the sum-only planes
# ---------------------------------------------------------------------------
#
# Key observation (VERDICT r4): consumers of the rowtail output only ever
# read each quantity's value at a ROW TAIL (lane 127), yet v2 computes a
# full inclusive lane scan (7 log-shift combine steps, ~4-12 VPU lane ops
# each) for all ~35 quantities. v4 restructures the lane phase:
#
# - Per-bar SUM quantities (buy/sell/total volume & dollars, tick counts,
#   spread) become lane REDUCTIONS (``jnp.sum``) over exact 16-bit
#   components — 1 reduce per component instead of a masked log-shift
#   scan with carry tracking. Component sums over <=128 lanes are bounded
#   by 128*65535 < 2^23, so int32 never wraps and the (hi, lo) pair
#   reconstructs exactly via the split-carry trick.
# - The per-element prefixes that ARE still needed in-kernel (signed
#   volume/dollar/tick imbalances feeding the in-bar extremum tails, and
#   the bar-open base values) ride the MXU as triangular matmuls:
#   ``prefix = comps_f32 @ upper_triangular_ones``. All components are
#   bounded by 2^23 so float32 accumulation is exact (every partial sum
#   is an integer < 2^24).
# - Segmented extremum row tails become one shared suffix-mark mask (one
#   strict-lower-triangular matmul) plus a masked ``jnp.max``/``min``
#   per quantity — the extremum over the row's last segment.
# - Row phases (combining the 256 per-row tails down sublanes) are
#   unchanged narrow scans: v3 measured them as NOT the bottleneck.
#
# Output is BIT-IDENTICAL to bar_scan_rowtails (v2 is the parity oracle):
# all integer arithmetic is exact, and the float32 in-bar imbalance
# extrema are computed from the same exact int64 pairs with the same
# single pair->f32 rounding.

# f32 matmul precision for the v4 MXU scans. Measured on chip
# (scripts/probe_scan_kernels.py): HIGHEST (6-pass f32) is bit-exact for
# the <2^23 integer components and costs only ~1 ms over DEFAULT at 39M
# trades; DEFAULT (bf16x1) is INEXACT (psu/cv/cd extrema mismatch) and
# Mosaic rejects HIGH. The MXU is therefore not the kernel's bottleneck
# and exactness is free — HIGHEST, not configurable.
_V4_PRECISION = jax.lax.Precision.HIGHEST

# v4 SMEM carry slots (independent of the v2 layout)
_V_CV, _V_CD, _V_BU, _V_BD, _V_TU, _V_TD = 0, 2, 4, 6, 8, 10
_V_TB, _V_SP, _V_CT = 12, 13, 14
_V_CVB, _V_CDB, _V_CTB = 15, 17, 19
_V_HIGH, _V_LOW, _V_SPMAX = 20, 21, 22
_V_CTMIN, _V_CTMAX = 23, 24


def _row_scan(xs, combine):
    """Inclusive scan down the rows of one or more (ROWS, 1) arrays."""
    r = xs[0].shape[0]
    ys = xs
    shift = 1
    while shift < r:
        shifted = tuple(_roll(y, shift, 0) for y in ys)
        mask = _ge(ys[0].shape, 0, shift)
        comb = combine(shifted, ys)
        ys = tuple(jnp.where(mask, c, y) for c, y in zip(comb, ys))
        shift *= 2
    return ys


def _pair_add(h1, l1, h2, l2):
    """Exact int64 addition on (hi, lo) int32 pairs."""
    lo = l1 + l2
    ovf = ((lo + _BIAS) < (l2 + _BIAS)).astype(jnp.int32)
    return h1 + h2 + ovf, lo


def _comps4_to_pair(a, b, c, d):
    """Exact (hi, lo) pair from 16-bit-component sums.

    value = a + b*2^16 + c*2^32 + d*2^48 with int32 components (a, b may
    be any int32 from signed sums; arithmetic is exact mod 2^64 given the
    true value fits int64, mirroring the v2 kernel's wrap semantics).
    """
    mid = b + (a >> 16)                      # arithmetic shift = floor
    lo = ((mid & _M16) << 16) | (a & _M16)
    hi = c + (mid >> 16) + (d << 16)
    return hi, lo


def _rowtail_kernel_v4(ticks_ref, ulo_ref, uhi_ref, dlo_ref, dhi_ref,
                       side_ref, flags_ref, spread_ref, out_ref, ci32, cf32,
                       ROWS: int = ROWS, red_dots: bool = False):
    i = pl.program_id(0)
    first = i == 0
    z = jnp.zeros((), jnp.int32)
    zf = jnp.zeros((), jnp.float32)
    lastrow = (ROWS - 1, 0)
    f32 = jnp.float32

    ticks = ticks_ref[...]
    ulo = ulo_ref[...]
    uhi = uhi_ref[...]
    dlo = dlo_ref[...]
    dhi = dhi_ref[...]
    side = side_ref[...]
    flags = flags_ref[...]
    spread = spread_ref[...]

    valid = (flags & 1) != 0
    mark = (flags & 2) != 0
    mark32 = mark.astype(jnp.int32)
    is_buy = side == 1
    is_sell = side == -1
    traded = valid & (side != 0)

    cols = [None] * N_ROWTAIL
    row0 = ~_ge((ROWS, 1), 0, 1)             # (ROWS, 1) True on row 0

    def c32(k):
        return jnp.where(first, z, ci32[0, k])

    # ---- MXU helpers ------------------------------------------------------
    # triangular / ones matrices from iota compares (Pallas rejects
    # captured array constants). Components are < 2^23 so f32 matmul
    # accumulation is exact at any precision >= bf16x3 (every partial sum
    # is an integer < 2^24; see module docstring) — HIGHEST for safety.
    r_io = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c_io = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    U = (r_io <= c_io).astype(f32)           # inclusive lane prefix
    SL = (r_io > c_io).astype(f32)           # strict suffix count
    ones1 = jnp.ones((LANES, 1), f32)

    def dotf(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            precision=_V4_PRECISION, preferred_element_type=f32)

    # ---- shared segment structure ----------------------------------------
    mk_f = mark32.astype(f32)
    aft = dotf(mk_f, SL)                     # marks strictly after lane
    tailm = aft == zf                        # lanes in the row's last seg
    lastm = mark & tailm                     # the row's last mark
    # any mark in the row = marks after lane 0 + mark at lane 0
    rowmark = (aft[:, :1] + mk_f[:, :1]) > zf
    rowmark32 = rowmark.astype(jnp.int32)
    (seenR,) = _row_scan((rowmark32,), _c_or)
    seenRb = seenR != 0

    # ---- 16-bit components ------------------------------------------------
    def comps4f(hi, lo):
        return ((lo & _M16).astype(f32),
                (((lo >> 16) & _M16)).astype(f32),
                (hi & _M16).astype(f32),
                (((hi >> 16) & _M16)).astype(f32))

    u4 = comps4f(uhi, ulo)
    d4 = comps4f(dhi, dlo)
    bu4 = tuple(jnp.where(is_buy, x, zf) for x in u4)
    su4 = tuple(jnp.where(is_sell, x, zf) for x in u4)
    bd4 = tuple(jnp.where(is_buy, x, zf) for x in d4)
    sd4 = tuple(jnp.where(is_sell, x, zf) for x in d4)
    cv4 = tuple(b - s for b, s in zip(bu4, su4))
    cd4 = tuple(b - s for b, s in zip(bd4, sd4))
    tbm = (is_buy & valid).astype(jnp.int32)
    tsm = (is_sell & valid).astype(jnp.int32)
    ct_in = tbm - tsm
    ct_inf = ct_in.astype(f32)
    spv = jnp.where(valid, spread, z)
    sp_a = (spv & _M16).astype(f32)
    sp_b = ((spv >> 16) & _M16).astype(f32)

    # ---- lane prefixes on the MXU (only the imbalance chains) ------------
    cv4s = tuple(dotf(x, U) for x in cv4)
    cd4s = tuple(dotf(x, U) for x in cd4)
    ctLf = dotf(ct_inf, U)

    # ---- lane reductions for the sum-only quantities ----------------------
    def red(xf):
        if red_dots:            # ride the MXU instead of a VPU reduce
            return dotf(xf, ones1)
        return jnp.sum(xf, axis=1, keepdims=True, dtype=f32)

    def pair_rows(c4):
        a, b, c, d = [x.astype(jnp.int32) for x in c4]
        return _comps4_to_pair(a, b, c, d)

    bu_p = pair_rows(tuple(red(x) for x in bu4))
    bd_p = pair_rows(tuple(red(x) for x in bd4))
    tu_p = pair_rows(tuple(red(x) for x in u4))
    td_p = pair_rows(tuple(red(x) for x in d4))
    cv_p = pair_rows(tuple(x[:, LANES - 1:] for x in cv4s))
    cd_p = pair_rows(tuple(x[:, LANES - 1:] for x in cd4s))
    tb_r = red((is_buy & valid).astype(f32)).astype(jnp.int32)
    sp_r = red(sp_a).astype(jnp.int32) + \
        (red(sp_b).astype(jnp.int32) << 16)
    ct_r = ctLf[:, LANES - 1:].astype(jnp.int32)

    # ---- row phases: prefix sums ------------------------------------------
    def row_pair_scan(hp, lp, slot):
        chi, clo = c32(slot), c32(slot + 1)
        hs, ls = _row_scan((hp, lp), _c_sum_pair)
        lo_f = ls + clo
        ovf = ((lo_f + _BIAS) < (ls + _BIAS)).astype(jnp.int32)
        hi_f = hs + chi + ovf
        ci32[0, slot] = hi_f[lastrow]
        ci32[0, slot + 1] = lo_f[lastrow]
        return hi_f, lo_f, chi, clo

    cvh, cvl, cv_ch, cv_cl = row_pair_scan(*cv_p, _V_CV)
    cdh, cdl, cd_ch, cd_cl = row_pair_scan(*cd_p, _V_CD)
    buh, bul, _, _ = row_pair_scan(*bu_p, _V_BU)
    bdh, bdl, _, _ = row_pair_scan(*bd_p, _V_BD)
    tuh, tul, _, _ = row_pair_scan(*tu_p, _V_TU)
    tdh, tdl, _, _ = row_pair_scan(*td_p, _V_TD)
    suh, sul = _pair_sub(buh, bul, cvh, cvl)    # psu = pbu - pcv
    sdh, sdl = _pair_sub(bdh, bdl, cdh, cdl)

    def row_i32_scan(v, slot):
        carry = c32(slot)
        (s,) = _row_scan((v,), _c_sum)
        s = s + carry
        ci32[0, slot] = s[lastrow]
        return s, carry

    tb, _ = row_i32_scan(tb_r, _V_TB)
    sp, _ = row_i32_scan(sp_r, _V_SP)
    ct, ct_carry = row_i32_scan(ct_r, _V_CT)
    ts_ = tb - ct                                # pts = ptb - pct

    L = ROWTAIL_LANES
    cols[L["pbu_hi"]], cols[L["pbu_lo"]] = buh, bul
    cols[L["psu_hi"]], cols[L["psu_lo"]] = suh, sul
    cols[L["pbd_hi"]], cols[L["pbd_lo"]] = bdh, bdl
    cols[L["psd_hi"]], cols[L["psd_lo"]] = sdh, sdl
    cols[L["ptu_hi"]], cols[L["ptu_lo"]] = tuh, tul
    cols[L["ptd_hi"]], cols[L["ptd_lo"]] = tdh, tdl
    cols[L["ptb"]], cols[L["pts"]], cols[L["psp"]] = tb, ts_, sp

    # ---- segmented extremum row tails -------------------------------------
    tmv = tailm & valid
    tmt = tailm & traded

    def tail_red(v, is_max):
        return (jnp.max if is_max else jnp.min)(v, axis=1, keepdims=True)

    def row_seg_i32(tailv, slot, name, is_max, ident):
        m, _ = _row_scan((tailv, rowmark32),
                         _c_seg_max if is_max else _c_seg_min)
        carry = jnp.where(first, ident, ci32[0, slot])
        comb = jnp.maximum if is_max else jnp.minimum
        m_f = jnp.where(seenRb, m, comb(m, carry))
        cols[L[name]] = m_f
        ci32[0, slot] = m_f[lastrow]

    def row_seg_f32(tailv, slot_f, name, is_max, ident):
        m, _ = _row_scan((tailv, rowmark32),
                         _c_seg_max if is_max else _c_seg_min)
        carry = jnp.where(first, ident, cf32[0, slot_f])
        comb = jnp.maximum if is_max else jnp.minimum
        m_f = jnp.where(seenRb, m, comb(m, carry))
        cols[L[name]] = jax.lax.bitcast_convert_type(m_f, jnp.int32)
        cf32[0, slot_f] = m_f[lastrow]

    row_seg_i32(tail_red(jnp.where(tmv, ticks, _I32MIN), True),
                _V_HIGH, "high", True, _I32MIN)
    row_seg_i32(tail_red(jnp.where(tmv, ticks, _I32MAX), False),
                _V_LOW, "low", False, _I32MAX)
    row_seg_i32(tail_red(jnp.where(tmv, spread, np.int32(-1)), True),
                _V_SPMAX, "spmax", True, _I32MIN)

    # ---- bar-open bases ---------------------------------------------------
    # local exclusive prefix components at the row's last mark (one
    # masked reduction per component — exactly one lane qualifies)
    def extract4(s4, x4):
        return tuple(red(jnp.where(lastm, s - x, zf))
                     for s, x in zip(s4, x4))

    cvb_lh, cvb_ll = pair_rows(extract4(cv4s, cv4))
    cdb_lh, cdb_ll = pair_rows(extract4(cd4s, cd4))
    ctb_l = red(jnp.where(lastm, ctLf - ct_inf, zf)).astype(jnp.int32)

    # absolute exclusive row prefixes (value before the row's lane 0)
    def row_excl_pair(hi_incl, lo_incl, chi, clo):
        he = jnp.where(row0, chi, _roll(hi_incl, 1, 0))
        le = jnp.where(row0, clo, _roll(lo_incl, 1, 0))
        return he, le

    cv_eh, cv_el = row_excl_pair(cvh, cvl, cv_ch, cv_cl)
    cd_eh, cd_el = row_excl_pair(cdh, cdl, cd_ch, cd_cl)
    ct_e = jnp.where(row0, ct_carry, _roll(ct, 1, 0))

    def row_fill_pair(bh, bl, slot, hi_name, lo_name):
        chi, clo = c32(slot), c32(slot + 1)
        fh, fl, _ = _row_scan(
            (jnp.where(rowmark, bh, z), jnp.where(rowmark, bl, z),
             rowmark32), _c_last_pair)
        fh = jnp.where(seenRb, fh, chi)
        fl = jnp.where(seenRb, fl, clo)
        cols[L[hi_name]], cols[L[lo_name]] = fh, fl
        ci32[0, slot] = fh[lastrow]
        ci32[0, slot + 1] = fl[lastrow]
        return fh, fl

    cvb_ah, cvb_al = _pair_add(cvb_lh, cvb_ll, cv_eh, cv_el)
    cdb_ah, cdb_al = _pair_add(cdb_lh, cdb_ll, cd_eh, cd_el)
    fvh, fvl = row_fill_pair(cvb_ah, cvb_al, _V_CVB, "cvb_hi", "cvb_lo")
    fdh, fdl = row_fill_pair(cdb_ah, cdb_al, _V_CDB, "cdb_hi", "cdb_lo")

    ctb_carry = c32(_V_CTB)
    fct, _ = _row_scan((jnp.where(rowmark, ctb_l + ct_e, z), rowmark32),
                       _c_last)
    fct = jnp.where(seenRb, fct, ctb_carry)
    cols[L["ctb"]] = fct
    ci32[0, _V_CTB] = fct[lastrow]

    # ---- in-bar running imbalance extrema ---------------------------------
    # per-row pair adjustment: rel[i] = local_prefix[i] + adj, where adj
    # is -local_base for mark rows and (row_excl - carried_base) for
    # rows whose segment started earlier — all exact pair arithmetic, so
    # the single pair->f32 rounding is bit-identical to v2.
    def rel_adj(rowmark_, loc_h, loc_l, eh, el, fh, fl):
        nh, nl = _pair_neg(loc_h, loc_l)
        dh, dl = _pair_sub(eh, el, fh, fl)
        return (jnp.where(rowmark_, nh, dh), jnp.where(rowmark_, nl, dl))

    adj_vh, adj_vl = rel_adj(rowmark, cvb_lh, cvb_ll, cv_eh, cv_el,
                             fvh, fvl)
    adj_dh, adj_dl = rel_adj(rowmark, cdb_lh, cdb_ll, cd_eh, cd_el,
                             fdh, fdl)

    cvL_h, cvL_l = _comps4_to_pair(*[x.astype(jnp.int32) for x in cv4s])
    cdL_h, cdL_l = _comps4_to_pair(*[x.astype(jnp.int32) for x in cd4s])
    rel_cv = _pair_to_f32(*_pair_add(cvL_h, cvL_l, adj_vh, adj_vl))
    rel_cd = _pair_to_f32(*_pair_add(cdL_h, cdL_l, adj_dh, adj_dl))
    ctL = ctLf.astype(jnp.int32)
    adj_ct = jnp.where(rowmark, -ctb_l, ct_e - fct)
    rel_ct = ctL + adj_ct

    row_seg_i32(tail_red(jnp.where(tmt, rel_ct, _I32MAX), False),
                _V_CTMIN, "ctmin", False, _I32MAX)
    row_seg_i32(tail_red(jnp.where(tmt, rel_ct, _I32MIN), True),
                _V_CTMAX, "ctmax", True, _I32MIN)
    row_seg_f32(tail_red(jnp.where(tmt, rel_cv, _F32BIG), False),
                _SF_CVMIN, "cvmin", False, _F32BIG)
    row_seg_f32(tail_red(jnp.where(tmt, rel_cv, -_F32BIG), True),
                _SF_CVMAX, "cvmax", True, -_F32BIG)
    row_seg_f32(tail_red(jnp.where(tmt, rel_cd, _F32BIG), False),
                _SF_CDMIN, "cdmin", False, _F32BIG)
    row_seg_f32(tail_red(jnp.where(tmt, rel_cd, -_F32BIG), True),
                _SF_CDMAX, "cdmax", True, -_F32BIG)

    pad = jnp.zeros((ROWS, LANES - N_ROWTAIL), jnp.int32)
    out_ref[...] = jnp.concatenate(cols + [pad], axis=1)


def _io_floor_kernel(ticks_ref, ulo_ref, uhi_ref, dlo_ref, dhi_ref,
                     side_ref, flags_ref, spread_ref, out_ref):
    out_ref[...] = (ticks_ref[...] + ulo_ref[...] + uhi_ref[...]
                    + dlo_ref[...] + dhi_ref[...] + side_ref[...]
                    + flags_ref[...] + spread_ref[...])


@partial(jax.jit, static_argnames=("interpret", "block_rows"))
def bar_scan_io_floor(ticks, ulo, uhi, dlo, dhi, side, flags, spread,
                      interpret: bool = False, block_rows: int = 512):
    """Measurement probe: the pure streaming floor of the rowtail scan's
    IO shape (8 input planes in, 1 plane out, 1 add/element). Any fused
    kernel with the same plane set cannot run faster than this."""
    n_rows = ticks.shape[0]
    R = block_rows
    grid = (n_rows // R,)
    spec = pl.BlockSpec((R, LANES), lambda i: (i, np.int32(0)))
    return pl.pallas_call(
        _io_floor_kernel,
        grid=grid,
        in_specs=[spec] * 8,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(ticks.shape, jnp.int32),
        interpret=interpret,
    )(ticks, ulo, uhi, dlo, dhi, side, flags, spread)


def _io_floor_kernel_k(*refs):
    out_ref = refs[-1]
    acc = refs[0][...]
    for r in refs[1:-1]:
        acc = acc + r[...]
    out_ref[...] = acc


@partial(jax.jit, static_argnames=("k", "interpret", "block_rows"))
def bar_scan_io_floor_k(ticks, k: int = 1, interpret: bool = False,
                        block_rows: int = 512):
    """IO-scaling probe: k input planes (same array), 1 output."""
    n_rows = ticks.shape[0]
    R = block_rows
    grid = (n_rows // R,)
    spec = pl.BlockSpec((R, LANES), lambda i: (i, np.int32(0)))
    return pl.pallas_call(
        _io_floor_kernel_k,
        grid=grid,
        in_specs=[spec] * k,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(ticks.shape, jnp.int32),
        interpret=interpret,
    )(*([ticks] * k))


def _io_floor_kernel_stacked(x_ref, out_ref):
    x = x_ref[...]                       # (8, R, 128)
    out_ref[...] = jnp.sum(x, axis=0, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("interpret", "block_rows"))
def bar_scan_io_floor_stacked(x, interpret: bool = False,
                              block_rows: int = 512):
    """IO probe: the 8 planes as ONE pre-stacked (8, rows, 128) input —
    one DMA stream per block instead of eight."""
    n_rows = x.shape[1]
    R = block_rows
    grid = (n_rows // R,)
    return pl.pallas_call(
        _io_floor_kernel_stacked,
        grid=grid,
        in_specs=[pl.BlockSpec((8, R, LANES),
                               lambda i: (np.int32(0), i, np.int32(0)))],
        out_specs=pl.BlockSpec((R, LANES), lambda i: (i, np.int32(0))),
        out_shape=jax.ShapeDtypeStruct(x.shape[1:], jnp.int32),
        interpret=interpret,
    )(x)


# block height for v4: the row phases operate on (R, 1) columns whose
# vreg cost grows with R while the MXU lane work is R-independent;
# measured on chip R=64 / 128 / 256 -> see scripts/probe_scan_kernels.py
_V4_ROWS = int(os.environ.get("FMKT_V4_ROWS", "256"))


@partial(jax.jit, static_argnames=("interpret", "block_rows", "red_dots"))
def bar_scan_rowtails_v4(ticks, ulo, uhi, dlo, dhi, side, flags, spread,
                         interpret: bool = False, block_rows: int = None,
                         red_dots: bool = False):
    """MXU-offloaded variant of :func:`bar_scan_rowtails` (bit-identical).

    Sum-only quantities use lane reductions over exact 16-bit components;
    the imbalance prefixes and segment structure ride the MXU as
    triangular f32 matmuls (exact: all components < 2^23). See the v4
    section comment for the full design.
    """
    R = block_rows or _V4_ROWS
    n_rows = ticks.shape[0]
    grid = (n_rows // R,)
    spec = pl.BlockSpec((R, LANES), lambda i: (i, np.int32(0)))
    return pl.pallas_call(
        partial(_rowtail_kernel_v4, ROWS=R, red_dots=red_dots),
        grid=grid,
        in_specs=[spec] * 8,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(ticks.shape, jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, _N_I32_SLOTS), jnp.int32),
                        pltpu.SMEM((1, _N_F32_SLOTS), jnp.float32)],
        interpret=interpret,
    )(ticks, ulo, uhi, dlo, dhi, side, flags, spread)


@partial(jax.jit, static_argnames=("interpret",))
def bar_scan_rowtails_v3(ticks, ulo, uhi, dlo, dhi, side, flags, spread,
                         interpret: bool = False):
    """Batched-row-phase variant of :func:`bar_scan_rowtails`.

    Bit-identical output (the v2 kernel is the parity oracle); the row
    phases of all ~35 scan quantities run in three masked-combine tiles
    instead of per-quantity (ROWS, 1) column scans.

    MEASURED SLOWER than v2 (75 vs 59 ms at 39M trades on this chip):
    Mosaic evidently keeps the narrow per-quantity column scans in an
    efficient layout, while this variant pays ~65 lane concat/slice
    relayouts to marshal the tiles — the hypothesis that (ROWS, 1) ops
    cost full vregs did not survive contact with the hardware. Kept as
    the tested record of that negative result; v2 remains the default.
    """
    n_rows = ticks.shape[0]
    grid = (n_rows // ROWS,)
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, np.int32(0)))
    return pl.pallas_call(
        _rowtail_kernel_v3,
        grid=grid,
        in_specs=[spec] * 8,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(ticks.shape, jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, _N_I32_SLOTS), jnp.int32),
                        pltpu.SMEM((1, _N_F32_SLOTS), jnp.float32)],
        interpret=interpret,
    )(ticks, ulo, uhi, dlo, dhi, side, flags, spread)


@partial(jax.jit, static_argnames=("interpret",))
def bar_scan_rowtails(ticks, ulo, uhi, dlo, dhi, side, flags, spread,
                      interpret: bool = False):
    """Fused bar scan emitting per-row tail states only.

    Returns one ``(n_rows, 128)`` int32 plane; lane layout in
    ``ROWTAIL_LANES``. rows must be a multiple of ROWS (= 256).
    """
    n_rows = ticks.shape[0]
    grid = (n_rows // ROWS,)
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, np.int32(0)))
    return pl.pallas_call(
        _rowtail_kernel,
        grid=grid,
        in_specs=[spec] * 8,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(ticks.shape, jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, _N_I32_SLOTS), jnp.int32),
                        pltpu.SMEM((1, _N_F32_SLOTS), jnp.float32)],
        interpret=interpret,
    )(ticks, ulo, uhi, dlo, dhi, side, flags, spread)


@partial(jax.jit, static_argnames=("interpret",))
def bar_scan_planes(ticks, ulo, uhi, dlo, dhi, side, flags, spread,
                    interpret: bool = False):
    """Run the fused bar scan over (rows, 128) int32 planes.

    rows must be a multiple of ROWS (= 512). Returns 24 planes: 12 pair
    prefixes (bu, su, bd, sd, total-units, total-dollars as hi/lo),
    3 int32 prefixes (tb, ts, spread), 5 int32 running extrema (high,
    low, spmax, ctmin, ctmax) and 4 float32 running extrema (cvmin,
    cvmax, cdmin, cdmax).
    """
    n_rows = ticks.shape[0]
    grid = (n_rows // ROWS,)
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, np.int32(0)))
    shape_i32 = jax.ShapeDtypeStruct(ticks.shape, jnp.int32)
    shape_f32 = jax.ShapeDtypeStruct(ticks.shape, jnp.float32)
    out_shapes = [shape_i32] * 20 + [shape_f32] * 4
    return pl.pallas_call(
        _bar_scan_kernel,
        grid=grid,
        in_specs=[spec] * 8,
        out_specs=[spec] * 24,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((1, _N_I32_SLOTS), jnp.int32),
                        pltpu.SMEM((1, _N_F32_SLOTS), jnp.float32)],
        interpret=interpret,
    )(ticks, ulo, uhi, dlo, dhi, side, flags, spread)

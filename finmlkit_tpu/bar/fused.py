"""Fused TPU bar-products pipeline (the single-chip fast path).

Three dispatches end-to-end for the full OHLCV + directional product set
(reference workload: comp_bar_ohlcv + comp_bar_directional_features,
/root/reference/finmlkit/bar/base.py:306-546):

1. ``_prep_planes`` — one jit building the 8 masked int32 input planes
   (ticks, unit/dollar hi-lo pairs, sides, flags, spread) on the device;
2. :func:`finmlkit_tpu.ops.fused_scan.bar_scan_planes` — ONE Pallas pass
   computing every prefix sum and per-bar running extremum;
3. ``_gather_post`` — one jit gathering the 20 planes at the ~n_bars
   boundary positions (two-level row gathers: boundary>>7 row fetch then
   lane select — measured ~5x faster than flat gathers here).

Per-bar medians (np.median parity) run on the host in native C++
(finmlkit_tpu.native.seg_median_pair) *overlapped* with the device
dispatches — selection over ~1k-element cache-resident segments is a
latency workload the TPU is the wrong engine for, exactly the part the
reference leaves in Numba machine code. A device sort fallback
(ops.segment.sorted_segments) covers hosts without a toolchain.

Everything here uses 1-D (rows, 128) planes: (C, n) row-stacked arrays
execute ~200x slower on this TPU (the round-1 design's core mistake).
"""
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..ops.fused_scan import BLOCK, bar_scan_planes

__all__ = ["bar_products_fused", "prep_planes", "gather_planes"]


def _n_rows(n: int) -> int:
    return ((n + BLOCK - 1) // BLOCK) * (BLOCK // 128)


@partial(jax.jit, static_argnames=("n_pad",))
def _prep_planes(price_ticks, amount_units, sides, ci, n_pad: int):
    """Build the 8 masked (rows, 128) int32 input planes in one jit."""
    n = price_ticks.shape[0]
    pad = n_pad - n
    idx = jnp.arange(n, dtype=jnp.int64)
    valid = (idx > ci[0]) & (idx <= ci[-1])

    # bar-open marks at every ci[k] + 1 that lands inside the stream
    pos = jnp.clip(ci + 1, 0, n_pad)
    pos = jnp.where(ci + 1 < n, pos, n_pad)  # out-of-stream -> dropped slot
    marks = jnp.zeros((n_pad + 1,), jnp.int32).at[pos].set(1)[:n_pad]

    side32 = jnp.where(valid, sides.astype(jnp.int32), 0)
    units = jnp.where(valid, amount_units, 0)
    dollars = price_ticks.astype(jnp.int64) * units

    # tick-sign-change spread (reference comp_bar_directional_features
    # semantics, bar/base.py:409-546): single-trade bars compare against
    # side != 0; others against the previous trade
    prev_side = jnp.roll(sides, 1)
    prev_ticks = jnp.roll(price_ticks, 1)
    one = jnp.diff(ci) == 1
    spos = jnp.where(one, ci[1:], n)
    single_m = jnp.zeros((n + 1,), jnp.bool_).at[jnp.clip(spos, 0, n)].set(True)[:n]
    sign_change = jnp.where(valid & single_m, sides != 0, sides != prev_side)
    spread = jnp.where(valid & sign_change,
                       jnp.abs(price_ticks - prev_ticks), 0).astype(jnp.int32)

    def plane(x, dtype=jnp.int32):
        x = x.astype(dtype)
        x = jnp.concatenate([x, jnp.zeros((pad,), dtype)]) if pad else x
        return x.reshape(-1, 128)

    flags = valid.astype(jnp.int32) | (marks << 1)[:n]
    return (plane(price_ticks),
            plane(units.astype(jnp.uint32).astype(jnp.int32)),
            plane(units >> 32),
            plane(dollars.astype(jnp.uint32).astype(jnp.int32)),
            plane(dollars >> 32),
            plane(side32),
            plane(flags),
            plane(spread))


def prep_planes(price_ticks, amount_units, sides, ci):
    n = int(price_ticks.shape[0])
    return _prep_planes(price_ticks, amount_units, sides, ci,
                        _n_rows(n) * 128), n


def _g(plane, pos):
    """Two-level gather: row fetch then lane select."""
    rows = plane[pos >> 7]
    return rows[jnp.arange(pos.shape[0]), pos & 127]


@jax.jit
def _gather_post(planes, ticks_plane, ci):
    """Gather the 20 scan planes at bar boundaries; per-bar raw outputs."""
    (pbu_hi, pbu_lo, psu_hi, psu_lo, pbd_hi, pbd_lo, psd_hi, psd_lo,
     ptu_hi, ptu_lo, ptd_hi, ptd_lo,
     ptb, pts, psp, r_high, r_low, r_spmax, r_ctmin, r_ctmax,
     r_cvmin, r_cvmax, r_cdmin, r_cdmax) = planes[:24]
    n_elems = ticks_plane.shape[0] * 128
    e = jnp.clip(ci[1:], 0, n_elems - 1).astype(jnp.int32)
    a_raw = ci[:-1]
    amask = a_raw >= 0
    a = jnp.clip(a_raw, 0, n_elems - 1).astype(jnp.int32)

    def pair_at(hi, lo, pos):
        return (_g(hi, pos).astype(jnp.int64) << 32) | \
            _g(lo, pos).astype(jnp.uint32).astype(jnp.int64)

    def rsum_pair(hi, lo):
        end = pair_at(hi, lo, e)
        start = jnp.where(amask, pair_at(hi, lo, a), 0)
        return end - start

    def rsum_i32(p):
        end = _g(p, e)
        start = jnp.where(amask, _g(p, a), 0)
        return (end - start).astype(jnp.int64)

    vol_buy_u = rsum_pair(pbu_hi, pbu_lo)
    vol_sell_u = rsum_pair(psu_hi, psu_lo)
    dol_buy_u = rsum_pair(pbd_hi, pbd_lo)
    dol_sell_u = rsum_pair(psd_hi, psd_lo)
    vol_u = rsum_pair(ptu_hi, ptu_lo)
    dollar_u = rsum_pair(ptd_hi, ptd_lo)
    ticks_buy = rsum_i32(ptb)
    ticks_sell = rsum_i32(pts)
    cum_spread_t = rsum_i32(psp)

    counts = jnp.diff(ci)
    close_t = _g(ticks_plane, e)
    first_idx = jnp.clip(a_raw + 1, 0, n_elems - 1).astype(jnp.int32)
    open_raw = _g(ticks_plane, first_idx)

    high_t = _g(r_high, e)
    low_t = _g(r_low, e)
    max_spread_t = _g(r_spmax, e)
    ct_min = _g(r_ctmin, e)
    ct_max = _g(r_ctmax, e)
    cv_min = _g(r_cvmin, e)
    cv_max = _g(r_cvmax, e)
    cd_min = _g(r_cdmin, e)
    cd_max = _g(r_cdmax, e)

    return (open_raw, high_t, low_t, close_t, counts, vol_u, dollar_u,
            vol_buy_u, vol_sell_u, dol_buy_u, dol_sell_u,
            ticks_buy, ticks_sell, cum_spread_t, max_spread_t,
            ct_min, ct_max, cv_min, cv_max, cd_min, cd_max)


def gather_planes(planes, ticks_plane, ci):
    return _gather_post(tuple(planes), ticks_plane, ci)


_I32MIN = -2147483648
_I32MAX = 2147483647
_F32BIG = 3.0e38


def fused_raw_device(price_ticks, amount_units, ci, sides,
                     interpret: bool = False):
    """Device part of the fused pipeline: 3 dispatches, per-bar raw
    integer outputs (no medians). ``ci`` must be int64 close indices."""
    planes_in, _ = prep_planes(price_ticks, amount_units, sides, ci)
    planes = bar_scan_planes(*planes_in, interpret=interpret)
    return gather_planes(planes, planes_in[0], ci)


@partial(jax.jit, static_argnames=("n_pad", "interpret"))
def _fused_all_jit(price_ticks, amount_units, sides, ci, n_pad: int,
                   interpret: bool):
    """prep -> Pallas scan -> boundary gathers in ONE compiled program
    (one dispatch over the remote transport instead of three)."""
    planes_in = _prep_planes(price_ticks, amount_units, sides, ci, n_pad)
    planes = bar_scan_planes(*planes_in, interpret=interpret)
    return _gather_post(tuple(planes), planes_in[0], ci)


def fused_raw_device_onejit(price_ticks, amount_units, ci, sides,
                            interpret: bool = False):
    """Single-dispatch variant of :func:`fused_raw_device`."""
    n = int(price_ticks.shape[0])
    return _fused_all_jit(price_ticks, amount_units, sides, ci,
                          _n_rows(n) * 128, interpret)


@partial(jax.jit, static_argnames=("n_pad", "interpret"))
def _fused_packed_jit(price_ticks, amount_units, sides, ci, n_pad: int,
                      interpret: bool):
    """One dispatch, minimal readback: prep -> Pallas scan -> boundary
    gathers, packed into THREE stacked host buffers (i64 sums / i32
    ticks / f32 extrema) so the remote transport sees 3 transfers of
    ~5 MB instead of 21 round-trips.
    """
    planes_in = _prep_planes(price_ticks, amount_units, sides, ci, n_pad)
    planes = bar_scan_planes(*planes_in, interpret=interpret)
    raw = _gather_post(tuple(planes), planes_in[0], ci)
    (open_raw, high_t, low_t, close_t, counts, vol_u, dollar_u,
     vol_buy_u, vol_sell_u, dol_buy_u, dol_sell_u,
     ticks_buy, ticks_sell, cum_spread_t, max_spread_t,
     ct_min, ct_max, cv_min, cv_max, cd_min, cd_max) = raw

    packed_i64 = jnp.stack([vol_u, dollar_u, vol_buy_u, vol_sell_u,
                            dol_buy_u, dol_sell_u])
    packed_i32 = jnp.stack([open_raw, high_t, low_t, close_t,
                            ticks_buy.astype(jnp.int32),
                            ticks_sell.astype(jnp.int32),
                            cum_spread_t.astype(jnp.int32),
                            max_spread_t, ct_min, ct_max])
    packed_f32 = jnp.stack([cv_min, cv_max, cd_min, cd_max])
    return packed_i64, packed_i32, packed_f32


def fused_packed_device(price_ticks, amount_units, ci, sides,
                        interpret: bool = False):
    """Single-dispatch fused products with packed 3-buffer readback."""
    n = int(price_ticks.shape[0])
    return _fused_packed_jit(price_ticks, amount_units, sides, ci,
                             _n_rows(n) * 128, interpret)


# ---------------------------------------------------------------------------
# Boundary-output pipeline (v2): per-row tail states + XLA boundary fixup
# ---------------------------------------------------------------------------

def _rowtail_init_row():
    """Initial running state before the stream (lane layout in
    ops.fused_scan.ROWTAIL_LANES): zero prefixes/bases, sentinel extrema."""
    from ..ops.fused_scan import ROWTAIL_LANES as L
    init = np.zeros(128, np.int32)
    init[L["high"]] = _I32MIN
    init[L["low"]] = _I32MAX
    init[L["spmax"]] = _I32MIN
    init[L["ctmin"]] = _I32MAX
    init[L["ctmax"]] = _I32MIN
    init[L["cvmin"]] = np.float32(_F32BIG).view(np.int32)
    init[L["cvmax"]] = np.float32(-_F32BIG).view(np.int32)
    init[L["cdmin"]] = np.float32(_F32BIG).view(np.int32)
    init[L["cdmax"]] = np.float32(-_F32BIG).view(np.int32)
    return init


def _i64_to_f32_pairstyle(x):
    """int64 -> float32 with the SAME double-rounding as the Pallas
    kernel's _pair_to_f32 (hi*2^32 then + lo), for bit-identical rel
    imbalance extrema between the v1 and v2 pipelines."""
    hi = (x >> 32).astype(jnp.int32).astype(jnp.float32)
    lo_i = x.astype(jnp.uint32).astype(jnp.int32)
    lo_f = lo_i.astype(jnp.float32) + jnp.where(
        lo_i < 0, jnp.float32(4294967296.0), jnp.float32(0.0))
    return hi * jnp.float32(4294967296.0) + lo_f


def _boundary_state(rowtail, planes_in, pos):
    """Exact running scan state at positions ``pos`` (int32, (n_pos,)).

    Reconstructs every quantity the full-plane kernel would have held at
    position p as combine(rowtail[p>>7 - 1], masked reduction over the
    gathered input row) — the same segmented/carry semantics as
    ops.fused_scan._rowtail_kernel, in plain XLA on (n_pos, 128) tiles.
    """
    from ..ops.fused_scan import ROWTAIL_LANES as L

    (ticks_p, ulo_p, uhi_p, dlo_p, dhi_p, side_p, flags_p, spread_p) = planes_in
    r = (pos >> 7).astype(jnp.int32)
    l = (pos & 127).astype(jnp.int32)
    iota = jnp.arange(128, dtype=jnp.int32)[None, :]

    S = rowtail[jnp.maximum(r - 1, 0)]
    S = jnp.where((r == 0)[:, None],
                  jnp.asarray(_rowtail_init_row())[None, :], S)

    def srow(name):
        return S[:, L[name]]

    def spair(name):
        return (srow(name + "_hi").astype(jnp.int64) << 32) | \
            srow(name + "_lo").astype(jnp.uint32).astype(jnp.int64)

    def sf32(name):
        return jax.lax.bitcast_convert_type(srow(name), jnp.float32)

    ticks = ticks_p[r]
    side = side_p[r]
    flags = flags_p[r]
    spread = spread_p[r]
    units = (uhi_p[r].astype(jnp.int64) << 32) | \
        ulo_p[r].astype(jnp.uint32).astype(jnp.int64)
    dollars = (dhi_p[r].astype(jnp.int64) << 32) | \
        dlo_p[r].astype(jnp.uint32).astype(jnp.int64)

    valid = (flags & 1) != 0
    mark = (flags & 2) != 0
    is_buy = side == 1
    is_sell = side == -1
    traded = valid & (side != 0)
    le = iota <= l[:, None]
    z64 = jnp.int64(0)
    z32 = jnp.int32(0)

    def psum64(mask, v):
        return jnp.sum(jnp.where(mask & le, v, z64), axis=1)

    def psum32(mask, v):
        return jnp.sum(jnp.where(mask & le, v, z32), axis=1,
                       dtype=jnp.int32)

    st = {}
    st["P_bu"] = spair("pbu") + psum64(is_buy, units)
    st["P_su"] = spair("psu") + psum64(is_sell, units)
    st["P_bd"] = spair("pbd") + psum64(is_buy, dollars)
    st["P_sd"] = spair("psd") + psum64(is_sell, dollars)
    st["P_tu"] = spair("ptu") + psum64(valid, units)
    st["P_td"] = spair("ptd") + psum64(valid, dollars)
    tbm = (is_buy & valid).astype(jnp.int32)
    tsm = (is_sell & valid).astype(jnp.int32)
    st["P_tb"] = srow("ptb") + jnp.sum(jnp.where(le, tbm, z32), axis=1,
                                       dtype=jnp.int32)
    st["P_ts"] = srow("pts") + jnp.sum(jnp.where(le, tsm, z32), axis=1,
                                       dtype=jnp.int32)
    st["P_sp"] = srow("psp") + psum32(valid, spread)

    # ---- segmented extrema: reset at the last bar-open mark <= l ----
    mark_le = mark & le
    any_mark = jnp.any(mark_le, axis=1)
    lm = jnp.max(jnp.where(mark_le, iota, jnp.int32(-1)), axis=1)
    seg = (iota >= jnp.maximum(lm, 0)[:, None]) & le

    def seg_red(v, sentinel, s_name, is_max, f32=False):
        vv = jnp.where(seg, v, sentinel)
        red = (jnp.max if is_max else jnp.min)(vv, axis=1)
        Sv = sf32(s_name) if f32 else srow(s_name)
        comb = jnp.maximum if is_max else jnp.minimum
        return jnp.where(any_mark, red, comb(Sv, red))

    st["high"] = seg_red(jnp.where(valid, ticks, _I32MIN), _I32MIN,
                         "high", True)
    st["low"] = seg_red(jnp.where(valid, ticks, _I32MAX), _I32MAX,
                        "low", False)
    st["spmax"] = seg_red(jnp.where(valid, spread, jnp.int32(-1)),
                          _I32MIN, "spmax", True)

    # ---- in-bar running imbalances: per-lane prefixes via log-shifts
    # (XLA's cumsum lowering compiles pathologically on this TPU) ----
    def prefix128(x):
        for s in (1, 2, 4, 8, 16, 32, 64):
            x = x + jnp.where(iota >= s, jnp.roll(x, s, axis=1),
                              jnp.zeros((), x.dtype))
        return x

    def at_lm(x):
        return jnp.take_along_axis(
            x, jnp.maximum(lm, 0)[:, None].astype(jnp.int32), axis=1)[:, 0]

    def rel_extrema(contrib, s_base_pair, s_min, s_max, base_i64, f32):
        lane = base_i64[:, None] + prefix128(contrib)
        e_at = at_lm(lane) - at_lm(contrib)
        base = jnp.where(any_mark, e_at, s_base_pair)
        rel = lane - base[:, None]
        if f32:
            relv = _i64_to_f32_pairstyle(rel)
            big, nbig = jnp.float32(_F32BIG), jnp.float32(-_F32BIG)
            mn = seg_red(jnp.where(traded, relv, big), big, s_min,
                         False, f32=True)
            mx = seg_red(jnp.where(traded, relv, nbig), nbig, s_max,
                         True, f32=True)
        else:
            mn = seg_red(jnp.where(traded, rel, _I32MAX), _I32MAX,
                         s_min, False)
            mx = seg_red(jnp.where(traded, rel, _I32MIN), _I32MIN,
                         s_max, True)
        return mn, mx

    cvx = jnp.where(is_buy, units, z64) - jnp.where(is_sell, units, z64)
    cdx = jnp.where(is_buy, dollars, z64) - jnp.where(is_sell, dollars, z64)
    st["cvmin"], st["cvmax"] = rel_extrema(
        cvx, spair("cvb"), "cvmin", "cvmax",
        spair("pbu") - spair("psu"), f32=True)
    st["cdmin"], st["cdmax"] = rel_extrema(
        cdx, spair("cdb"), "cdmin", "cdmax",
        spair("pbd") - spair("psd"), f32=True)
    ctx = tbm - tsm
    st["ctmin"], st["ctmax"] = rel_extrema(
        ctx, srow("ctb"), "ctmin", "ctmax",
        srow("ptb") - srow("pts"), f32=False)
    return st


@partial(jax.jit, static_argnames=("n_pad", "interpret", "kernel"))
def _fused_packed_v2_jit(price_ticks, amount_units, sides, ci, n_pad: int,
                         interpret: bool, kernel: str = "v2"):
    """Boundary-output pipeline in ONE compiled program: prep -> per-row
    tail scan (no full-plane materialization) -> boundary-state fixup at
    the ~n_bars close positions -> packed 3-buffer readback.

    Same output layout as ``_fused_packed_jit`` (consumed by
    ``_unpack_raw``/``_convert_host``); ~24x less HBM write traffic in
    the scan stage. ``kernel`` selects the rowtail scan engine: ``"v2"``
    (per-quantity VPU lane scans) or ``"v4"`` (MXU-offloaded reductions;
    bit-identical output, see ops/fused_scan.py).
    """
    from ..ops.fused_scan import bar_scan_rowtails, bar_scan_rowtails_v4

    planes_in = _prep_planes(price_ticks, amount_units, sides, ci, n_pad)
    scan_fn = bar_scan_rowtails_v4 if kernel == "v4" else bar_scan_rowtails
    rowtail = scan_fn(*planes_in, interpret=interpret)
    ticks_plane = planes_in[0]
    n_elems = ticks_plane.shape[0] * 128

    e = jnp.clip(ci[1:], 0, n_elems - 1).astype(jnp.int32)
    a_raw = ci[:-1]
    a0 = jnp.clip(a_raw[0], 0, n_elems - 1).astype(jnp.int32)
    pos = jnp.concatenate([e, a0[None]])
    st = _boundary_state(rowtail, planes_in, pos)

    amask = a_raw >= 0

    def rsum64(name):
        P = st[name]
        Pe = P[:-1]
        start = jnp.concatenate([P[-1][None], Pe[:-1]])
        return Pe - jnp.where(amask, start, 0)

    def rsum32(name):
        P = st[name]
        Pe = P[:-1]
        start = jnp.concatenate([P[-1][None], Pe[:-1]])
        # subtract in int32 BEFORE widening: the prefixes wrap mod 2^32
        # by design (see ops/fused_scan.py precision notes)
        return (Pe - jnp.where(amask, start, 0)).astype(jnp.int64)

    vol_u = rsum64("P_tu")
    dollar_u = rsum64("P_td")
    vol_buy_u = rsum64("P_bu")
    vol_sell_u = rsum64("P_su")
    dol_buy_u = rsum64("P_bd")
    dol_sell_u = rsum64("P_sd")
    ticks_buy = rsum32("P_tb")
    ticks_sell = rsum32("P_ts")
    cum_spread_t = rsum32("P_sp")

    close_t = _g(ticks_plane, e)
    first_idx = jnp.clip(a_raw + 1, 0, n_elems - 1).astype(jnp.int32)
    open_raw = _g(ticks_plane, first_idx)

    packed_i64 = jnp.stack([vol_u, dollar_u, vol_buy_u, vol_sell_u,
                            dol_buy_u, dol_sell_u])
    packed_i32 = jnp.stack([open_raw, st["high"][:-1],
                            st["low"][:-1], close_t,
                            ticks_buy.astype(jnp.int32),
                            ticks_sell.astype(jnp.int32),
                            cum_spread_t.astype(jnp.int32),
                            st["spmax"][:-1], st["ctmin"][:-1],
                            st["ctmax"][:-1]])
    packed_f32 = jnp.stack([st["cvmin"][:-1], st["cvmax"][:-1],
                            st["cdmin"][:-1], st["cdmax"][:-1]])
    return packed_i64, packed_i32, packed_f32


def fused_packed_v2_device(price_ticks, amount_units, ci, sides,
                           interpret: bool = False, kernel: str = "v2"):
    """Single-dispatch boundary-output fused products (v2 pipeline)."""
    n = int(price_ticks.shape[0])
    return _fused_packed_v2_jit(price_ticks, amount_units, sides, ci,
                                _n_rows(n) * 128, interpret, kernel)


@partial(jax.jit, static_argnames=("n_pad", "interpret", "kernel"))
def _fused_packed_one_jit(price_ticks, amount_units, sides, ci, n_pad: int,
                          interpret: bool, kernel: str = "v2"):
    """Products with ONE packed int32 readback buffer.

    The remote transport pays a fixed latency per transfer on top of the
    byte cost (BENCH_NOTES.md); folding the 3 packed buffers (i64 sums /
    i32 ticks / f32 extrema) into a single (26, n_bars) int32 buffer
    (i64 as hi+lo rows, f32 bitcast) trades two transfer round-trips for
    zero extra bytes.
    """
    p64, p32, pf = _fused_packed_v2_jit(price_ticks, amount_units, sides,
                                        ci, n_pad, interpret, kernel)
    hi = (p64 >> 32).astype(jnp.int32)
    lo = p64.astype(jnp.uint32).astype(jnp.int32)
    pfi = jax.lax.bitcast_convert_type(pf, jnp.int32)
    return jnp.concatenate([hi, lo, p32, pfi], axis=0)


def fused_packed_one_device(price_ticks, amount_units, ci, sides,
                            interpret: bool = False, kernel: str = "v2"):
    """Single-dispatch products, single-buffer readback."""
    n = int(price_ticks.shape[0])
    return _fused_packed_one_jit(price_ticks, amount_units, sides, ci,
                                 _n_rows(n) * 128, interpret, kernel)


# single-buffer FINAL readback row layout (see _fused_packed_final_jit)
_FINAL_ROWS = ["open_t", "high_t", "low_t", "close_t",
               "ticks_buy", "ticks_sell", "max_spread_f", "ct_min",
               "ct_max", "vol_hi", "vol_lo", "dol_hi", "dol_lo",
               "mean_spread_f", "vol_buy_f", "vol_sell_f", "dol_buy_f",
               "dol_sell_f", "cv_min_f", "cv_max_f", "cd_min_f",
               "cd_max_f"]


@partial(jax.jit, static_argnames=("n_pad", "interpret", "kernel"))
def _fused_packed_final_jit(price_ticks, amount_units, sides, ci,
                            tick_size, amount_scale,
                            n_pad: int, interpret: bool, kernel: str):
    """Products with the f64 unit conversion ON DEVICE and one
    final-dtype readback buffer.

    The raw packed layout reads back ~4.7 MB (6 x i64 sums + 10 x i32 +
    4 x f32); most finals are float32, so converting on device shrinks
    the transfer to one (21, n_bars) i32 buffer (~3.7 MB at 45.7k bars)
    AND folds three transfers into one. OHLC stays as fixed-up i32 price
    ticks (the host multiplies by tick_size in f64 for free); vwap
    travels as an f64 hi/lo bit pair. Device f64 is emulated but the
    arrays are (n_bars,)-sized. Every op replicates _convert_host's
    expression order for bit-identical finals.
    """
    p64, p32, pf = _fused_packed_v2_jit(price_ticks, amount_units, sides,
                                        ci, n_pad, interpret, kernel)
    (vol_u, dollar_u, vol_buy_u, vol_sell_u, dol_buy_u, dol_sell_u) = p64
    (open_raw, high_t, low_t, close_t, ticks_buy, ticks_sell,
     cum_spread_t, max_spread_t, ct_min, ct_max) = p32
    cv_min, cv_max, cd_min, cd_max = pf
    f64 = jnp.float64
    ts = tick_size.astype(f64)
    asc = amount_scale.astype(f64)
    counts = jnp.diff(ci)
    empty = counts == 0

    open_t = jnp.where(empty, close_t, open_raw)
    high = jnp.where(empty, close_t, high_t)
    low = jnp.where(empty, close_t, low_t)

    def bits(xf32):
        return jax.lax.bitcast_convert_type(xf32, jnp.int32)

    # vwap/volume need f64 division of i64 sums — f64<->i64 bitcasts do
    # not lower on this TPU, so the vol/dollar sums travel as hi/lo i32
    # pairs and the host computes those two columns (tiny f64 work)
    total_ticks = (ticks_buy.astype(jnp.int64)
                   + ticks_sell.astype(jnp.int64))
    mean_spread = (cum_spread_t.astype(f64) * ts
                   / total_ticks.astype(f64)).astype(jnp.float32)

    def minmax_f32(mn, mx, factor):
        big = jnp.float64(_F32BIG / 2)
        mnf = jnp.where(empty | (mn.astype(f64) >= big), 1e9,
                        jnp.minimum(mn.astype(f64) * factor, 1e9))
        mxf = jnp.where(empty | (mx.astype(f64) <= -big), -1e9,
                        jnp.maximum(mx.astype(f64) * factor, -1e9))
        return mnf.astype(jnp.float32), mxf.astype(jnp.float32)

    cv_min_o, cv_max_o = minmax_f32(cv_min, cv_max, asc)
    cd_min_o, cd_max_o = minmax_f32(cd_min, cd_max, asc * ts)
    ct_min_o = jnp.where(empty | (ct_min == _I32MAX), 10**9,
                         jnp.minimum(ct_min, 10**9))
    ct_max_o = jnp.where(empty | (ct_max == _I32MIN), -(10**9),
                         jnp.maximum(ct_max, -(10**9)))
    msp = jnp.where(empty, 0, max_spread_t)
    max_spread_f = (jnp.maximum(msp, 0).astype(f64)
                    * ts).astype(jnp.float32)

    rows = [open_t, high, low, close_t, ticks_buy, ticks_sell,
            bits(max_spread_f), ct_min_o, ct_max_o,
            (vol_u >> 32).astype(jnp.int32),
            vol_u.astype(jnp.uint32).astype(jnp.int32),
            (dollar_u >> 32).astype(jnp.int32),
            dollar_u.astype(jnp.uint32).astype(jnp.int32),
            bits(mean_spread),
            bits((vol_buy_u.astype(f64) * asc).astype(jnp.float32)),
            bits((vol_sell_u.astype(f64) * asc).astype(jnp.float32)),
            bits((dol_buy_u.astype(f64) * asc * ts).astype(jnp.float32)),
            bits((dol_sell_u.astype(f64) * asc * ts).astype(jnp.float32)),
            bits(cv_min_o), bits(cv_max_o), bits(cd_min_o),
            bits(cd_max_o)]
    return jnp.stack(rows)


def _assemble_final(buf, ci_host, med, tick_size, amount_scale):
    """Host assembly of the device-converted finals (tiny f64 work:
    OHLC tick scaling plus volume/vwap from the i64 sum pairs — the
    f64<->i64 bitcasts vwap would need do not lower on this TPU)."""
    b = np.asarray(buf)
    r = {name: b[i] for i, name in enumerate(_FINAL_ROWS)}
    counts = np.diff(np.asarray(ci_host))
    med_a, med_b = med
    tsf, asc = float(tick_size), float(amount_scale)

    def f32(name):
        return r[name].view(np.float32)

    median = (med_a.astype(np.float64) + med_b.astype(np.float64)) * 0.5
    vol_u = (r["vol_hi"].astype(np.int64) << 32) \
        | r["vol_lo"].view(np.uint32).astype(np.int64)
    dollar_u = (r["dol_hi"].astype(np.int64) << 32) \
        | r["dol_lo"].view(np.uint32).astype(np.int64)
    empty = counts == 0
    vol = vol_u.astype(np.float64) * asc
    with np.errstate(invalid="ignore", divide="ignore"):
        vwap = np.where(vol_u > 0,
                        dollar_u / np.where(vol_u > 0, vol_u, 1) * tsf,
                        0.0)
    ohlcv = {
        "open": r["open_t"].astype(np.float64) * tsf,
        "high": r["high_t"].astype(np.float64) * tsf,
        "low": r["low_t"].astype(np.float64) * tsf,
        "close": r["close_t"].astype(np.float64) * tsf,
        "volume": np.where(empty, 0.0, vol).astype(np.float32),
        "vwap": np.where(empty, 0.0, vwap),
        "trades": counts,
        "median_trade_size": np.where(empty, 0.0, median),
    }
    directional = {
        "ticks_buy": r["ticks_buy"].astype(np.int64),
        "ticks_sell": r["ticks_sell"].astype(np.int64),
        "volume_buy": f32("vol_buy_f"),
        "volume_sell": f32("vol_sell_f"),
        "dollars_buy": f32("dol_buy_f"),
        "dollars_sell": f32("dol_sell_f"),
        "mean_spread": f32("mean_spread_f"),
        "max_spread": f32("max_spread_f"),
        "cum_ticks_min": r["ct_min"].astype(np.int64),
        "cum_ticks_max": r["ct_max"].astype(np.int64),
        "cum_volume_min": f32("cv_min_f"),
        "cum_volume_max": f32("cv_max_f"),
        "cum_dollars_min": f32("cd_min_f"),
        "cum_dollars_max": f32("cd_max_f"),
    }
    return ohlcv, directional


def bar_products_final_device(price_ticks, amount_units, ci, sides, *,
                              tick_size, amount_scale, amounts_f32,
                              ci_host=None, max_count=None,
                              interpret: bool = False,
                              kernel: str = "v4"):
    """Products + medians with device-side f64 conversion and ONE
    final-dtype readback buffer (see :func:`_fused_packed_final_jit`).
    Bit-identical outputs to :func:`bar_products_fused`."""
    n = int(price_ticks.shape[0])
    buf = _fused_packed_final_jit(price_ticks, amount_units, sides, ci,
                                  jnp.float64(tick_size),
                                  jnp.float64(amount_scale),
                                  _n_rows(n) * 128, interpret, kernel)
    med = median_rowsort_device(amounts_f32, ci, interpret=interpret,
                                max_count=max_count)
    _start_host_copies((buf,) + tuple(med))
    return _assemble_final(buf, ci_host if ci_host is not None else ci,
                           (np.asarray(med[0]), np.asarray(med[1])),
                           tick_size, amount_scale)


def _unpack_one(buf, ci_host):
    """Rebuild the 21-tuple raw layout from the single packed buffer."""
    b = np.asarray(buf)
    hi, lo, p32, pfi = b[:6], b[6:12], b[12:22], b[22:26]
    p64 = (hi.astype(np.int64) << 32) | \
        lo.view(np.uint32).astype(np.int64)
    pf = pfi.view(np.float32)
    return _unpack_raw((p64, p32, pf), ci_host)


@partial(jax.jit, static_argnames=("n_pad", "C", "interpret",
                                   "use_pallas"))
def _products_withmed_jit(price_ticks, amount_units, sides, ci,
                          amounts_f32, n_pad: int, C: int,
                          interpret: bool, use_pallas: bool):
    """v2 products + rowsort medians in ONE compiled program.

    One dispatch instead of two — per-dispatch overhead through a remote
    transport is tens of ms. The r3 lesson about not embedding the
    median engine in the scan program concerned the radix-select
    engine's big-table scatters; the rowsort engine is sort+gather only
    and composes cleanly (the bench races both arrangements anyway).
    """
    p64, p32, pf = _fused_packed_v2_jit(price_ticks, amount_units, sides,
                                        ci, n_pad, interpret)
    ma, mb = _median_rowsort_whole_jit(ci, amounts_f32, n_pad, C,
                                       interpret, use_pallas)
    return p64, p32, pf, ma, mb


def fused_packed_withmed_device(price_ticks, amount_units, ci, sides,
                                amounts_f32, max_count: int = None,
                                interpret: bool = False, C: int = None):
    """One-dispatch v2 products + rowsort medians.

    Returns (packed_i64, packed_i32, packed_f32, med_a, med_b); None
    when the rowsort preconditions fail (caller uses the two-program
    arrangement instead).
    """
    from ..ops.pallas_scan import _runs_on_tpu

    n = int(price_ticks.shape[0])
    n_pad = _n_rows(n) * 128
    if max_count is None:
        max_count = int(np.max(np.diff(np.asarray(ci))))
    if C is None:
        C = _rowsort_pick_C(max_count, n_pad)
    if n_pad % C != 0 or n_pad // C < 2 or max_count > C:
        return None
    use_pallas = interpret or _runs_on_tpu(price_ticks)
    return _products_withmed_jit(price_ticks, amount_units, sides, ci,
                                 amounts_f32, n_pad, C, interpret,
                                 use_pallas)


@partial(jax.jit, static_argnames=("n_pad", "interpret", "use_pallas"))
def _median_select_whole_jit(ci, amounts_f32, n_pad: int, interpret: bool,
                             use_pallas: bool):
    """The ENTIRE radix median selection as one compiled program.

    Eagerly the engine is ~25 separate op launches; through the remote
    transport each launch costs tens of ms, adding up to seconds. One
    program = one launch. (Fusing it into the big 24-plane scan program
    regressed that program ~5x, so it stays a standalone jit.)
    """
    from ..ops.pallas_scan import _cumsum_2d
    from ..ops.segment_select import segment_median_pair_select

    n = amounts_f32.shape[0]
    n_bars = ci.shape[0] - 1
    pad = n_pad - n
    amounts_pad = jnp.concatenate(
        [amounts_f32, jnp.zeros((pad,), jnp.float32)]) if pad else amounts_f32
    # ADD-scatter of bar opens: empty bars share an open position but
    # must still advance the id (ops/segment.bar_ids_from_close_indices)
    marks = jnp.zeros((n_pad + 1,), jnp.int32).at[
        jnp.clip(ci[1:] + 1, 0, n_pad)].add(np.int32(1))[:n_pad]
    idx = jnp.arange(n_pad, dtype=ci.dtype)
    valid = (idx > ci[0]) & (idx <= ci[-1])
    if use_pallas and not interpret:
        bar_cum = _cumsum_2d(marks.reshape(-1, 128),
                             interpret=False).reshape(-1)
    else:
        bar_cum = jnp.cumsum(marks)
    bar_id = jnp.clip(bar_cum, 0, n_bars - 1).astype(jnp.int32)
    return segment_median_pair_select(
        amounts_pad, ci, bar_id, valid, n_pad=n_pad,
        interpret=interpret, use_pallas=use_pallas)


def median_select_device(amounts_f32, ci, interpret: bool = False):
    """Per-bar np.median brackets via the radix select engine (one jit)."""
    from ..ops.pallas_scan import _runs_on_tpu

    n = int(amounts_f32.shape[0])
    n_pad = _n_rows(n) * 128
    use_pallas = interpret or _runs_on_tpu(amounts_f32)
    return _median_select_whole_jit(ci, amounts_f32, n_pad, interpret,
                                    use_pallas)


@partial(jax.jit, static_argnames=("n_pad", "interpret", "use_pallas"))
def _median_sort_whole_jit(ci, amounts_f32, n_pad: int, interpret: bool,
                           use_pallas: bool):
    """Per-bar np.median brackets via ONE global composite-key sort.

    The default device median engine (round 4). Packs
    ``(bar_id << 32) | order_bits(amount)`` into int64 and sorts once
    (measured 219 ms warm at 39M keys on this chip — ~10x faster than
    the threaded host ``nth_element`` on a slow driver host, and ~12x
    faster than the radix-select engine whose big-table scatters hit
    XLA's serial path; see BENCH_NOTES.md). Bars are contiguous trade
    ranges, so after the sort bar *i*'s trades sit ascending at offset
    ``ci[i] - ci[0]`` and the two middle values are two tiny gathers.

    Runs as ONE compiled program: eagerly the chain is ~10 dispatches,
    each costing tens of ms over the remote transport.
    """
    from ..ops.pallas_scan import _cumsum_2d
    from ..ops.segment import (_f32_from_sortable_bits, _f32_sortable_bits,
                               segment_median_pair)

    n = amounts_f32.shape[0]
    n_bars = ci.shape[0] - 1
    pad = n_pad - n
    amounts_pad = jnp.concatenate(
        [amounts_f32, jnp.zeros((pad,), jnp.float32)]) if pad else amounts_f32
    # ADD-scatter of bar opens (empty bars share an open position but
    # must still advance the id), then a Pallas prefix sum — XLA's own
    # cumsum lowering compiles pathologically on this TPU
    marks = jnp.zeros((n_pad + 1,), jnp.int32).at[
        jnp.clip(ci[1:] + 1, 0, n_pad)].add(np.int32(1))[:n_pad]
    if use_pallas and not interpret:
        bar_cum = _cumsum_2d(marks.reshape(-1, 128),
                             interpret=False).reshape(-1)
    else:
        bar_cum = jnp.cumsum(marks)
    bar_id = jnp.clip(bar_cum, 0, n_bars - 1)
    idx = jnp.arange(n_pad, dtype=ci.dtype)
    valid = (idx > ci[0]) & (idx <= ci[-1])
    bid = jnp.where(valid, bar_id, jnp.int32(n_bars)).astype(jnp.uint64)
    key = (bid << 32) | _f32_sortable_bits(amounts_pad).astype(jnp.uint64)
    skey = jnp.sort(key.astype(jnp.int64)).astype(jnp.uint64)
    svals = _f32_from_sortable_bits(
        (skey & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))
    offsets = ci[:-1] - ci[0]
    counts = jnp.diff(ci)
    return segment_median_pair(svals, offsets, counts)


def median_sort_device(amounts_f32, ci, interpret: bool = False):
    """Per-bar np.median brackets via the one-sort engine (one jit).

    Host-independent, exact (same brackets as np.median), ~220 ms at 39M
    trades on this chip. ``median_rowsort_device`` (the default) beats it
    ~2x by sorting independent rows; this flat sort remains the fallback
    for pathologically long bars. ``median_select_device`` (radix select)
    and the native host path are further explicitly-selected options —
    see ``bar_products_fused``.
    """
    from ..ops.pallas_scan import _runs_on_tpu

    n = int(amounts_f32.shape[0])
    n_pad = _n_rows(n) * 128
    use_pallas = interpret or _runs_on_tpu(amounts_f32)
    return _median_sort_whole_jit(ci, amounts_f32, n_pad, interpret,
                                  use_pallas)


_ROWSORT_C = 32768      # max row width: one scan BLOCK per row


def _rowsort_pick_C(max_count: int, n_pad: int) -> int:
    """Adaptive row width for the batched-row-sort median engine.

    XLA's TPU sort is comparator-network-bound: batched row sorts cost
    ~n*log2(C)^2, so the narrowest row that still satisfies the
    one-boundary-per-bar invariant (max bar length <= C) wins. The floor
    (FMKT_ROWSORT_CMIN) balances the sort saving against the two-run
    bisection cost, which grows with the number of row-spanning bars
    (~n_pad/C). Measured on chip at 39M trades / 45.7k bars (amortized,
    scripts/probe_median_C.py): C=2048 56.5ms, 4096 50.7, **8192 49.5**,
    16384 51.2, 32768 56.5 — default floor 8192.
    """
    c_min = int(os.environ.get("FMKT_ROWSORT_CMIN", "8192"))
    C = max(c_min, 512)
    while C < max_count or (n_pad % C != 0) or (n_pad // C < 2):
        C *= 2
        if C > _ROWSORT_C:
            return C  # caller falls back to the flat sort
    return C


@partial(jax.jit, static_argnames=("n_pad", "C", "interpret",
                                   "use_pallas"))
def _median_rowsort_whole_jit(ci, amounts_f32, n_pad: int, C: int,
                              interpret: bool, use_pallas: bool):
    """Per-bar np.median brackets via BATCHED row sorts (one jit).

    The trade axis reshapes to (R, C) rows sorted INDEPENDENTLY on the
    composite key ``(bar_id << 32) | raw_f32_bits`` — measured 82 ms at
    39M keys vs 213 ms for the flat 39M sort (n*log(C) work and better
    core utilization). Rows are contiguous trade ranges, so a bar fully
    inside one row lands ascending at a closed-form offset. The <= R-1
    bars that SPAN a row boundary (exactly one boundary each — the
    caller guarantees max bar length <= C, falling back to the flat
    engine otherwise) have two already-sorted fragments; their brackets
    come from a vectorized two-run rank bisection.

    Positivity invariant: raw bits of nonnegative float32 are an
    order-preserving nonnegative int32 key (see ops/segment_select.py).
    """
    from ..ops.pallas_scan import _cumsum_2d

    n = amounts_f32.shape[0]
    n_bars = ci.shape[0] - 1
    pad = n_pad - n
    amounts_pad = jnp.concatenate(
        [amounts_f32, jnp.zeros((pad,), jnp.float32)]) if pad else amounts_f32
    bits = jax.lax.bitcast_convert_type(amounts_pad, jnp.int32)

    marks = jnp.zeros((n_pad + 1,), jnp.int32).at[
        jnp.clip(ci[1:] + 1, 0, n_pad)].add(np.int32(1))[:n_pad]
    if use_pallas and not interpret:
        bar_cum = _cumsum_2d(marks.reshape(-1, 128),
                             interpret=False).reshape(-1)
    else:
        bar_cum = jnp.cumsum(marks)
    bar_id = jnp.clip(bar_cum, 0, n_bars - 1)
    idx = jnp.arange(n_pad, dtype=ci.dtype)
    valid = (idx > ci[0]) & (idx <= ci[-1])
    bid = jnp.where(valid, bar_id, jnp.int32(n_bars))
    key = (bid.astype(jnp.int64) << 32) | \
        bits.astype(jnp.uint32).astype(jnp.int64)

    R = n_pad // C
    (skey,) = jax.lax.sort((key.reshape(R, C),), num_keys=1, dimension=1)
    sflat = skey.reshape(-1).astype(jnp.uint64)
    svals = jax.lax.bitcast_convert_type(
        (sflat & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).astype(
            jnp.int32), jnp.float32)

    counts = jnp.diff(ci)
    a1 = ci[:-1] + 1                       # first trade of each bar
    e = ci[1:]                             # last trade of each bar
    r_k = jnp.clip(a1, 0, n_pad - 1) // C
    # leading invalid trades (idx <= ci[0]) sort to the END of their row,
    # so the valid data of row r starts compacted at position 0 shifted
    # by them only when they precede the bar in the same row
    lead_inv = jnp.clip(ci[0] + 1 - r_k * C, 0, C)
    off = a1 - r_k * C - lead_inv
    lo = r_k * C + off + (jnp.maximum(counts - 1, 0) >> 1)
    hi = r_k * C + off + (jnp.maximum(counts, 1) >> 1)
    med_a_in = svals[jnp.clip(lo, 0, n_pad - 1)]
    med_b_in = svals[jnp.clip(hi, 0, n_pad - 1)]

    # --- row-spanning bars -------------------------------------------
    # The caller guarantees max bar length <= C, so a spanning bar has
    # EXACTLY two fragments — the tail of row r and the head of row r+1
    # — and both are already sorted ascending inside the row-sorted
    # array. The k-th smallest of two sorted runs is a 16-step rank
    # bisection over tiny (R-1,)-vector gathers: no gather matrix, no
    # extra sort (a padded re-sort measured ~0.4 s at monthly counts;
    # this is ~1 ms).
    span = (jnp.clip(a1, 0, n_pad - 1) // C != jnp.clip(e, 0, n_pad - 1)
            // C) & (counts > 0)
    if R > 1:
        sfi = jax.lax.bitcast_convert_type(svals, jnp.int32)  # value bits
        sidx = jnp.arange(R - 1, dtype=ci.dtype)
        b_s = jnp.clip(jnp.searchsorted(ci[1:], (sidx + 1) * C,
                                        side="left"), 0, n_bars - 1)
        a1_s = ci[b_s] + 1
        e_s = ci[b_s + 1]
        r_s = jnp.clip(a1_s, 0, n_pad - 1) // C
        lead = jnp.clip(ci[0] + 1 - r_s * C, 0, C)
        offA = r_s * C + (a1_s - r_s * C - lead)   # run A start in sflat
        la = (r_s + 1) * C - a1_s                   # tail-fragment length
        offB = (r_s + 1) * C                        # run B = next row head
        lb = e_s - (r_s + 1) * C + 1
        imax = jnp.int32(0x7FFFFFFF)
        imin = jnp.int32(-0x80000000)

        def run_at(off, ln, x):
            v = sfi[jnp.clip(off + jnp.clip(x, 0, ln - 1), 0, n_pad - 1)]
            v = jnp.where(x < 0, imin, v)
            return jnp.where(x >= ln, imax, v)

        def kth2(t):
            """Largest of the t smallest elements of runs A and B
            (i.e. the (t-1)-indexed order statistic of the union)."""
            lo = jnp.maximum(t - lb, 0)
            hi = jnp.minimum(t, la)
            for _ in range(17):  # > log2(C)
                i = (lo + hi) >> 1
                a_i = run_at(offA, la, i)
                b_jm = run_at(offB, lb, t - i - 1)
                too_low = a_i < b_jm       # must take more from A
                lo = jnp.where(too_low, i + 1, lo)
                hi = jnp.where(too_low, hi, i)
            i = lo
            last_a = run_at(offA, la, i - 1)
            last_b = run_at(offB, lb, t - i - 1)
            return jnp.maximum(last_a, last_b)

        c_s = counts[b_s]
        ga = kth2((jnp.maximum(c_s - 1, 0) >> 1) + 1)
        gb = kth2((jnp.maximum(c_s, 1) >> 1) + 1)
        # candidates whose bar does not truly span (tail rows, invalid
        # boundary trades) go to a dump slot — a clipped junk candidate
        # must never race a real spanner's scatter
        b_eff = jnp.where(span[b_s], b_s, jnp.int64(n_bars))
        sp_a = jnp.zeros((n_bars + 1,), jnp.int32).at[b_eff].set(
            ga)[:n_bars]
        sp_b = jnp.zeros((n_bars + 1,), jnp.int32).at[b_eff].set(
            gb)[:n_bars]
        med_a = jnp.where(span, jax.lax.bitcast_convert_type(
            sp_a, jnp.float32), med_a_in)
        med_b = jnp.where(span, jax.lax.bitcast_convert_type(
            sp_b, jnp.float32), med_b_in)
    else:
        med_a, med_b = med_a_in, med_b_in
    return med_a, med_b


def median_rowsort_device(amounts_f32, ci, interpret: bool = False,
                          max_count: int = None, C: int = None):
    """Per-bar np.median brackets via batched row sorts (DEFAULT engine).

    ~2x faster than :func:`median_sort_device` at monthly trade counts
    even at the widest rows (82 ms vs 213 ms sort stage at 39M, C=32768);
    the row width adapts down to the longest bar via
    :func:`_rowsort_pick_C` (narrower rows = shallower comparator
    networks). Requires the longest bar to fit one row (``max_count <=
    C``, from the caller's host ``ci`` or one tiny device readback) so
    every spanning bar has exactly two sorted fragments; falls back to
    the flat one-sort engine otherwise.
    """
    from ..ops.pallas_scan import _runs_on_tpu

    n = int(amounts_f32.shape[0])
    n_pad = _n_rows(n) * 128
    if max_count is None:
        max_count = int(np.max(np.diff(np.asarray(ci))))
    if C is None:
        C = _rowsort_pick_C(max_count, n_pad)
    if n_pad % C != 0 or n_pad // C < 2 or max_count > C:
        return median_sort_device(amounts_f32, ci, interpret=interpret)
    use_pallas = interpret or _runs_on_tpu(amounts_f32)
    return _median_rowsort_whole_jit(ci, amounts_f32, n_pad, C,
                                     interpret, use_pallas)


def _unpack_raw(packed, ci_host):
    """Rebuild the 21-tuple raw layout from the packed buffers."""
    p64, p32, pf = [np.asarray(x) for x in packed]
    counts = np.diff(np.asarray(ci_host))
    vol_u, dollar_u, vol_buy_u, vol_sell_u, dol_buy_u, dol_sell_u = p64
    (open_raw, high_t, low_t, close_t, ticks_buy, ticks_sell,
     cum_spread_t, max_spread_t, ct_min, ct_max) = p32
    cv_min, cv_max, cd_min, cd_max = pf
    return (open_raw, high_t, low_t, close_t, counts, vol_u, dollar_u,
            vol_buy_u, vol_sell_u, dol_buy_u, dol_sell_u,
            ticks_buy.astype(np.int64), ticks_sell.astype(np.int64),
            cum_spread_t.astype(np.int64), max_spread_t,
            ct_min, ct_max, cv_min, cv_max, cd_min, cd_max)


def _convert_host(raw, med, tick_size, amount_scale):
    """Host-side f64 unit conversion on the small per-bar arrays."""
    (open_raw, high_t, low_t, close_t, counts, vol_u, dollar_u,
     vol_buy_u, vol_sell_u, dol_buy_u, dol_sell_u,
     ticks_buy, ticks_sell, cum_spread_t, max_spread_t,
     ct_min, ct_max, cv_min, cv_max, cd_min, cd_max) = [np.asarray(x) for x in raw]
    med_a, med_b = med
    ts, asc = float(tick_size), float(amount_scale)
    empty = counts == 0

    open_t = np.where(empty, close_t, open_raw)
    high = np.where(empty, close_t, high_t)
    low = np.where(empty, close_t, low_t)
    vol = vol_u.astype(np.float64) * asc
    with np.errstate(invalid="ignore", divide="ignore"):
        vwap = np.where(vol_u > 0,
                        dollar_u / np.where(vol_u > 0, vol_u, 1) * ts, 0.0)
    median = (med_a.astype(np.float64) + med_b.astype(np.float64)) * 0.5

    total_ticks = ticks_buy + ticks_sell
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_spread = cum_spread_t.astype(np.float64) * ts / total_ticks

    def minmax_f32(mn, mx, factor):
        # untouched bars carry +-3e38 sentinels; empty bars gather the
        # previous bar's running value -> both map to the reference's
        # +-1e9 init values
        mnf = np.where(empty | (mn >= _F32BIG / 2), 1e9,
                       np.minimum(mn.astype(np.float64) * factor, 1e9))
        mxf = np.where(empty | (mx <= -_F32BIG / 2), -1e9,
                       np.maximum(mx.astype(np.float64) * factor, -1e9))
        return mnf, mxf

    cv_min_o, cv_max_o = minmax_f32(cv_min, cv_max, asc)
    cd_min_o, cd_max_o = minmax_f32(cd_min, cd_max, asc * ts)
    ct_min_o = np.where(empty | (ct_min == _I32MAX), 10**9,
                        np.minimum(ct_min.astype(np.int64), 10**9))
    ct_max_o = np.where(empty | (ct_max == _I32MIN), -10**9,
                        np.maximum(ct_max.astype(np.int64), -10**9))
    max_spread_t = np.where(empty, 0, max_spread_t)

    ohlcv = {
        "open": open_t.astype(np.float64) * ts,
        "high": high.astype(np.float64) * ts,
        "low": low.astype(np.float64) * ts,
        "close": close_t.astype(np.float64) * ts,
        "volume": np.where(empty, 0.0, vol).astype(np.float32),
        "vwap": np.where(empty, 0.0, vwap),
        "trades": counts,
        "median_trade_size": np.where(empty, 0.0, median),
    }
    directional = {
        "ticks_buy": ticks_buy,
        "ticks_sell": ticks_sell,
        "volume_buy": (vol_buy_u.astype(np.float64) * asc).astype(np.float32),
        "volume_sell": (vol_sell_u.astype(np.float64) * asc).astype(np.float32),
        "dollars_buy": (dol_buy_u.astype(np.float64) * asc * ts).astype(np.float32),
        "dollars_sell": (dol_sell_u.astype(np.float64) * asc * ts).astype(np.float32),
        "mean_spread": mean_spread.astype(np.float32),
        "max_spread": (np.maximum(max_spread_t, 0).astype(np.float64) * ts).astype(np.float32),
        "cum_ticks_min": ct_min_o,
        "cum_ticks_max": ct_max_o,
        "cum_volume_min": cv_min_o.astype(np.float32),
        "cum_volume_max": cv_max_o.astype(np.float32),
        "cum_dollars_min": cd_min_o.astype(np.float32),
        "cum_dollars_max": cd_max_o.astype(np.float32),
    }
    return ohlcv, directional


def _median_device(amounts_f32, ci, n):
    """Device sort fallback for per-bar medians (no native toolchain)."""
    from ..ops.segment import (bar_ids_from_close_indices,
                               segment_median_pair, sorted_segments)
    n_bars = int(ci.shape[0]) - 1
    bar_id, valid = bar_ids_from_close_indices(ci, n)
    sorted_amt = sorted_segments(amounts_f32, bar_id, valid, n_bars)
    offsets = ci[:-1] - ci[0]
    counts = jnp.diff(ci)
    med_a, med_b = segment_median_pair(sorted_amt, offsets, counts)
    return np.asarray(med_a), np.asarray(med_b)


def trade_size_features_native(amounts_host, ci_host, theta, theta_mult):
    """Per-bar trade-size features from one native host pass.

    Reference semantics (comp_bar_trade_size_features,
    /root/reference/finmlkit/bar/base.py:549-612): log1p(mean/thr),
    log1p(p95/thr) with numpy-percentile interpolation, block-volume
    share (amounts strictly above thr), size Gini ``1 - sum((s/V)^2)``.
    Returns None when the native library is unavailable (callers fall
    back to the staged device path in aggregate_q).
    """
    theta = np.asarray(theta, np.float64)
    thr = theta * float(theta_mult)
    stats = native.seg_bar_stats(amounts_host, ci_host,
                                 thr=np.where(thr > 0, thr, np.inf), q=0.95)
    if stats is None:
        return None
    counts = np.diff(np.asarray(ci_host))
    pos = 0.95 * (np.maximum(counts, 1) - 1).astype(np.float64)
    frac = pos - stats["q_lo"]
    p95 = stats["q_a"].astype(np.float64) * (1.0 - frac) \
        + stats["q_b"].astype(np.float64) * frac

    total = stats["sum"]
    empty = counts == 0
    mean = total / np.maximum(counts, 1)
    base_nan = empty | (theta == 0.0)
    safe_thr = np.where(thr > 0, thr, 1.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_size_rel = np.where(base_nan, np.nan, np.log1p(mean / safe_thr))
        size_95_rel = np.where(base_nan, np.nan, np.log1p(p95 / safe_thr))
        vol_nan = base_nan | (total == 0.0)
        safe_total = np.where(total > 0, total, 1.0)
        pct_block = np.where(vol_nan, np.nan, stats["block_sum"] / safe_total)
        gini = np.where(vol_nan, np.nan,
                        1.0 - stats["sumsq"] / (safe_total ** 2))
        gini = np.where(vol_nan, np.nan, np.where(counts == 1, 0.0, gini))
    return {
        "mean_size_rel": mean_size_rel.astype(np.float32),
        "size_95_rel": size_95_rel.astype(np.float32),
        "pct_block": pct_block.astype(np.float32),
        "size_gini": gini.astype(np.float32),
    }


def _start_host_copies(bufs):
    """Kick off device->host DMA for every buffer without blocking."""
    for b in bufs:
        try:
            b.copy_to_host_async()
        except AttributeError:  # older jax array types
            break


def bar_products_fused(price_ticks, amount_units, ci, sides, *,
                       tick_size, amount_scale,
                       amounts_host=None, ci_host=None,
                       amounts_f32=None, interpret: bool = False,
                       one_dispatch: bool = False, packed: bool = False,
                       device_medians: bool = False, medians: str = None,
                       scan: str = "rowtail", one_buffer: bool = False):
    """Full fused OHLCV + directional bar products.

    The device dispatch, the device->host readback DMA, and the median
    selection all run overlapped: the device program is launched first,
    ``copy_to_host_async`` queues the readback behind it, and the median
    engine computes while both drain. With ``packed=True`` the device
    program additionally stacks the 21 per-bar outputs into 3 buffers so
    the remote transport pays 3 round-trips instead of 21 (the measured
    per-transfer overhead through the dev tunnel dominates the byte cost
    at ~45k-bar sizes).

    Median engine dispatch (``medians``) — the single selection point:

    - ``"rowsort"`` (DEFAULT): batched row-sort engine
      (:func:`median_rowsort_device`) — host-independent, ~100 ms at 39M
      trades on this chip (82 ms sort stage). Falls back to ``"sort"``
      when a single bar exceeds the row width (2^15 = 32768 trades).
    - ``"sort"``: flat one-sort device engine
      (:func:`median_sort_device`) — ~220 ms at 39M. Host-independent
      like rowsort (the host path's cost is hostage to whatever machine
      runs the pipeline: 0.3 s on a 2-core dev host but 2.9 s on the
      round-3 driver host).
    - ``"host"``: threaded native C++ ``nth_element``
      (``native.seg_median_pair``), overlapped with the device readback.
      Needs ``amounts_host``/``ci_host`` and a built native library;
      falls back to ``"sort"`` otherwise. Worth selecting only on a
      measured-fast many-core host.
    - ``"select"``: radix-select engine (:func:`median_select_device`).
      Quarantined: its per-(bar, byte) histogram scatter hits XLA's
      serial path (~2.6 s at 39M); kept for A/B probes only.
    - ``"hist"``: Pallas block-histogram refinement
      (ops/segment_hist.py). Exact and scatter-free, but measured
      ~480 ms at 39M on this chip (compute-bound: 8 streaming passes
      re-read the trade planes); kept as the A/B probe for hardware
      where the VPU outruns XLA's sort.

    :param price_ticks: int32 device array of quantized prices.
    :param amount_units: int64 device array of quantized amounts.
    :param ci: int64 close indices (device), reference convention.
    :param sides: int8 device array of tick-rule signs.
    :param amounts_host: float32 numpy amounts (for ``medians="host"``).
    :param ci_host: int64 numpy close indices (with ``amounts_host``).
    :param amounts_f32: float32 device amounts for the device engines
        (derived from ``amount_units`` when absent).
    :param device_medians: legacy alias for ``medians="select"``.
    :param scan: ``"rowtail"`` (DEFAULT, packed only) — boundary-output
        pipeline: the Pallas scan emits per-row tail states (~24x less
        HBM write traffic than the 24 full planes) and an XLA fixup
        reconstructs the exact boundary values; ``"planes"`` — the
        full-plane v1 pipeline.
    :returns: (ohlcv dict, directional dict) of host numpy arrays.
    """
    if medians is None:
        medians = "select" if device_medians else "rowsort"
    if medians == "host" and (amounts_host is None or ci_host is None
                              or not native.available()):
        medians = "rowsort"
    if medians == "rowsort+fused":
        # products + medians in ONE compiled program (one dispatch)
        if amounts_f32 is None and amounts_host is not None:
            pad = int(price_ticks.shape[0]) - len(amounts_host)
            amounts_f32 = jnp.asarray(np.concatenate(
                [amounts_host, np.zeros(pad, np.float32)]) if pad > 0
                else amounts_host[:price_ticks.shape[0]])
        mc = (int(np.max(np.diff(np.asarray(ci_host))))
              if ci_host is not None else None)
        combo = (fused_packed_withmed_device(
            price_ticks, amount_units, ci, sides, amounts_f32,
            max_count=mc, interpret=interpret)
            if packed and scan == "rowtail" and amounts_f32 is not None
            else None)
        if combo is not None:
            p64, p32, pf, ma, mb = combo
            _start_host_copies((p64, p32, pf, ma, mb))
            raw = _unpack_raw((p64, p32, pf),
                              ci_host if ci_host is not None else ci)
            med = (np.asarray(ma), np.asarray(mb))
            return _convert_host(raw, med, tick_size, amount_scale)
        medians = "rowsort"  # preconditions failed: two-program path
    if medians != "host" and amounts_f32 is None:
        if amounts_host is not None:
            # pad to the device stream length (trailing pads are outside
            # every bar range and ignored by the engines)
            pad = int(price_ticks.shape[0]) - len(amounts_host)
            amounts_f32 = jnp.asarray(np.concatenate(
                [amounts_host, np.zeros(pad, np.float32)]) if pad > 0
                else amounts_host[:price_ticks.shape[0]])
        else:
            # exact f32 reconstruction needs f64 — pathological COMPILE
            # on this TPU (minutes; BENCH_NOTES.md), so prefer passing
            # amounts_f32/amounts_host. One-time cost when hit; cached.
            amounts_f32 = (amount_units.astype(jnp.float64)
                           * amount_scale).astype(jnp.float32)
    if packed:
        if scan in ("rowtail", "rowtail4"):
            dev1 = (fused_packed_one_device if one_buffer
                    else fused_packed_v2_device)
            bufs = dev1(price_ticks, amount_units, ci, sides,
                        interpret=interpret,
                        kernel="v4" if scan == "rowtail4" else "v2")
            if one_buffer:
                bufs = (bufs,)
        else:
            bufs = fused_packed_device(price_ticks, amount_units, ci,
                                       sides, interpret=interpret)
    else:
        dev = fused_raw_device_onejit if one_dispatch else fused_raw_device
        bufs = dev(price_ticks, amount_units, ci, sides, interpret=interpret)
    if medians == "host":
        _start_host_copies(bufs)
        med = native.seg_median_pair(amounts_host, ci_host)
        if med is None:  # host library raced away; device fallback
            if amounts_f32 is None:  # host branch never derives it above
                pad = int(price_ticks.shape[0]) - len(amounts_host)
                amounts_f32 = jnp.asarray(np.concatenate(
                    [amounts_host, np.zeros(pad, np.float32)]) if pad > 0
                    else amounts_host[:price_ticks.shape[0]])
            med = median_sort_device(amounts_f32, ci, interpret=interpret)
    else:
        # device engine as its own short dispatch sequence; queued behind
        # the main program, read back with the packed buffers
        if medians == "select":
            med = median_select_device(amounts_f32, ci, interpret=interpret)
        elif medians == "hist":
            from ..ops.segment_hist import segment_median_pair_hist
            med = segment_median_pair_hist(amounts_f32, ci,
                                           interpret=interpret)
        elif medians == "sort":
            med = median_sort_device(amounts_f32, ci, interpret=interpret)
        else:
            mc = (int(np.max(np.diff(np.asarray(ci_host))))
                  if ci_host is not None else None)
            med = median_rowsort_device(amounts_f32, ci,
                                        interpret=interpret, max_count=mc)
        _start_host_copies(tuple(bufs) + tuple(med))
    if packed:
        ci_u = ci_host if ci_host is not None else ci
        raw = (_unpack_one(bufs[0], ci_u) if one_buffer
               else _unpack_raw(bufs, ci_u))
    else:
        raw = jax.device_get(bufs)
    med = (np.asarray(med[0]), np.asarray(med[1]))
    return _convert_host(raw, med, tick_size, amount_scale)

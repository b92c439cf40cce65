"""Integer-exact bar aggregations — the TPU fast path.

Same semantics as :mod:`finmlkit_tpu.bar.aggregate` (the f64 reference
path used on CPU and in parity tests), recast for this TPU's measured
performance profile:

1. integer and f32 ops compile in seconds and run at HBM bandwidth;
   **f64 multiply/divide/scan compile pathologically slowly** (minutes
   per program) — device kernels below contain no f64 arithmetic;
2. random gathers (searchsorted, x[bar_id]) execute ~100x slower than
   streaming ops — per-trade values of per-bar quantities come from
   scatter + prefix-sum "delta forward-fills" instead of gathers;
3. XLA's cumsum lowering is the worst compile offender, and a Pallas
   kernel nested inside a larger jit hangs the compiler — so prefix
   sums run through :func:`finmlkit_tpu.ops.pallas_scan.fast_cumsum_cols`
   as **top-level stage boundaries**: each aggregation is a short
   pipeline ``jit pre -> pallas multi-column scan -> jit post``;
4. int64 prefix sums are exact, including two's-complement wraparound
   (differences at bar boundaries stay exact while any single bar's
   total fits int64).

Device stages return raw integer per-bar outputs; the public
``comp_bar_*_q`` wrappers convert to price/amount units host-side with
numpy f64 on tiny per-bar arrays.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_scan import combine_i64, fast_cumsum_cols
from ..ops.segment import (
    range_count,
    segment_median_pair,
    segment_quantile_pair,
    sorted_segments,
)


def _wrap_idx(idx, n):
    return jnp.where(idx < 0, idx + n, idx)


def _marks_row(ci, n, dtype):
    """Ones at bar-open positions; prefix sum of this row = bar_id."""
    pos = ci[1:] + 1
    val = jnp.where(pos < n, jnp.ones((), dtype), jnp.zeros((), dtype))
    return jnp.zeros((n,), dtype).at[jnp.clip(pos, 0, n - 1)].add(val)


def _rsum(P_incl, ci):
    """Per-bar sum over (ci[i], ci[i+1]] from an inclusive prefix row."""
    n = P_incl.shape[0]
    hi = P_incl[jnp.clip(ci[1:], 0, n - 1)]
    lo_idx = ci[:-1]
    lo = jnp.where(lo_idx >= 0, P_incl[jnp.clip(lo_idx, 0, n - 1)], 0)
    return hi - lo


def _rsum_pair(Phi_row, Plo_row, ci):
    """Per-bar int64 sums from (hi, lo) int32 prefix pairs: gather the
    pair at the boundaries, recombine per bar, subtract (exact)."""
    n = Phi_row.shape[0]
    e = jnp.clip(ci[1:], 0, n - 1)
    a_idx = jnp.clip(ci[:-1], 0, n - 1)
    end_v = combine_i64(Phi_row[e], Plo_row[e])
    start_v = jnp.where(ci[:-1] >= 0,
                        combine_i64(Phi_row[a_idx], Plo_row[a_idx]), 0)
    return end_v - start_v


def _bar_axis(P_marks, ci, n):
    n_bars = ci.shape[0] - 1
    idx = jnp.arange(n, dtype=ci.dtype)
    bar_id = jnp.clip(P_marks, 0, n_bars - 1).astype(ci.dtype)
    valid = (idx > ci[0]) & (idx <= ci[-1])
    return bar_id, valid


# ---------------------------------------------------------------------------
# OHLCV
# ---------------------------------------------------------------------------

@jax.jit
def _ohlcv_pre(price_ticks, amount_units, ci):
    n = price_ticks.shape[0]
    dollars = price_ticks.astype(jnp.int64) * amount_units
    marks = _marks_row(ci, n, jnp.int32)[None, :]
    return jnp.stack([amount_units, dollars]), marks


@jax.jit
def _ohlcv_post(price_ticks, amounts_f32, ci, Phi, Plo, Pmarks):
    n = price_ticks.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = _bar_axis(Pmarks[0], ci, n)

    counts = range_count(ci)
    end_idx = _wrap_idx(ci[1:], n)
    first_idx = _wrap_idx(jnp.minimum(ci[:-1] + 1, n - 1), n)
    close_t = price_ticks[end_idx]
    open_t = jnp.where(counts == 0, close_t, price_ticks[first_idx])

    big = jnp.iinfo(jnp.int32)
    high_t = jax.ops.segment_max(
        jnp.where(valid, price_ticks, big.min), bar_id,
        num_segments=n_bars, indices_are_sorted=True)
    low_t = jax.ops.segment_min(
        jnp.where(valid, price_ticks, big.max), bar_id,
        num_segments=n_bars, indices_are_sorted=True)
    high_t = jnp.where(counts == 0, close_t, high_t)
    low_t = jnp.where(counts == 0, close_t, low_t)

    vol_u = _rsum_pair(Phi[0], Plo[0], ci)
    dollar_u = _rsum_pair(Phi[1], Plo[1], ci)

    sorted_amt = sorted_segments(amounts_f32, bar_id, valid, n_bars)
    offsets = ci[:-1] - ci[0]
    med_a, med_b = segment_median_pair(sorted_amt, offsets, counts)
    return open_t, high_t, low_t, close_t, vol_u, dollar_u, counts, med_a, med_b


def ohlcv_q_device(price_ticks, amount_units, amounts_f32, ci):
    """On-device OHLCV pipeline; returns raw integer device arrays."""
    stacked, marks = _ohlcv_pre(price_ticks, amount_units, ci)
    Phi, Plo = fast_cumsum_cols(stacked, as_pair=True)
    del stacked
    Pmarks = fast_cumsum_cols(marks)
    del marks
    return _ohlcv_post(price_ticks, amounts_f32, ci, Phi, Plo, Pmarks)


# kept name for callers/benches
_ohlcv_q_device = ohlcv_q_device


def comp_bar_ohlcv_q(price_ticks, amount_units, amounts_f32, ci,
                     tick_size, amount_scale):
    """Integer-exact OHLCV; unit conversion happens host-side in f64."""
    raw = ohlcv_q_device(price_ticks, amount_units, amounts_f32, ci)
    (open_t, high_t, low_t, close_t, vol_u, dollar_u, counts,
     med_a, med_b) = jax.device_get(raw)
    median = (med_a.astype(np.float64) + med_b.astype(np.float64)) * 0.5
    ts, asc = float(tick_size), float(amount_scale)
    empty = counts == 0
    vol = vol_u.astype(np.float64) * asc
    with np.errstate(invalid="ignore", divide="ignore"):
        vwap = np.where(vol_u > 0,
                        dollar_u / np.where(vol_u > 0, vol_u, 1) * ts, 0.0)
    return {
        "open": open_t.astype(np.float64) * ts,
        "high": high_t.astype(np.float64) * ts,
        "low": low_t.astype(np.float64) * ts,
        "close": close_t.astype(np.float64) * ts,
        "volume": np.where(empty, 0.0, vol).astype(np.float32),
        "vwap": np.where(empty, 0.0, vwap),
        "trades": counts,
        "median_trade_size": np.where(empty, 0.0, median),
    }


# ---------------------------------------------------------------------------
# Directional features
# ---------------------------------------------------------------------------

def _single_trade_bar_mask(ci, n):
    """Per-trade mask of trades that form a one-trade bar (gather-free)."""
    one = jnp.diff(ci) == 1
    pos = jnp.where(one, ci[1:], n)
    m = jnp.zeros((n + 1,), jnp.bool_).at[jnp.clip(pos, 0, n)].set(True)
    return m[:n]


@jax.jit
def _directional_pre(price_ticks, amount_units, ci, sides):
    """Scan rows split by dtype (HBM economy at 39M trades):
    i64 [vol_buy, vol_sell, dol_buy, dol_sell, s*units, s*dollars];
    i32 [spread, s, ticks_buy, ticks_sell, marks] (within-bar totals all
    fit int32; wraparound prefix diffs stay exact)."""
    n = price_ticks.shape[0]
    s64 = sides.astype(jnp.int64)
    is_buy = s64 == 1
    is_sell = s64 == -1
    dollars = price_ticks.astype(jnp.int64) * amount_units

    prev_side = jnp.roll(sides, 1)
    prev_ticks = jnp.roll(price_ticks, 1)
    idx = jnp.arange(n, dtype=jnp.int64)
    valid = (idx > ci[0]) & (idx <= ci[-1])
    single = valid & _single_trade_bar_mask(ci, n)
    sign_change = jnp.where(single, sides != 0, sides != prev_side)
    spread32 = jnp.where(sign_change,
                         jnp.abs(price_ticks - prev_ticks), 0).astype(jnp.int32)

    sv = jnp.where(valid, s64, 0)
    rows64 = jnp.stack([
        jnp.where(is_buy, amount_units, 0),
        jnp.where(is_sell, amount_units, 0),
        jnp.where(is_buy, dollars, 0),
        jnp.where(is_sell, dollars, 0),
        sv * amount_units,
        sv * dollars,
    ])
    rows32 = jnp.stack([
        spread32,
        sv.astype(jnp.int32),
        is_buy.astype(jnp.int32),
        is_sell.astype(jnp.int32),
        _marks_row(ci, n, jnp.int32),
    ])
    return rows64, rows32


@jax.jit
def _directional_mid(Phi, Plo, P32, ci):
    """Base-fill delta rows for the 3 running-cum extrema: the per-bar
    base equals the global prefix at each bar's anchor, reconstructed
    gather-free as a scatter of previous-bar totals + prefix sum."""
    n = P32.shape[1]
    starts = jnp.clip(ci[:-1] + 1, 0, n - 1)

    def delta_row_pair(hi_row, lo_row):
        totals = _rsum_pair(hi_row, lo_row, ci)
        deltas = jnp.concatenate([jnp.zeros((1,), jnp.int64), totals[:-1]])
        return jnp.zeros((n,), jnp.int64).at[starts].add(deltas)

    def delta_row32(row):
        totals = _rsum(row, ci)
        deltas = jnp.concatenate([jnp.zeros((1,), row.dtype), totals[:-1]])
        return jnp.zeros((n,), row.dtype).at[starts].add(deltas)

    b64 = jnp.stack([delta_row_pair(Phi[4], Plo[4]),
                     delta_row_pair(Phi[5], Plo[5])])
    b32 = delta_row32(P32[1])[None, :]
    return b64, b32


@jax.jit
def _directional_post(Phi, Plo, P32, B64, B32, ci, sides):
    n = P32.shape[1]
    n_bars = ci.shape[0] - 1
    bar_id, valid = _bar_axis(P32[4], ci, n)

    ticks_buy = _rsum(P32[2], ci).astype(jnp.int64)
    ticks_sell = _rsum(P32[3], ci).astype(jnp.int64)
    volume_buy_u = _rsum_pair(Phi[0], Plo[0], ci)
    volume_sell_u = _rsum_pair(Phi[1], Plo[1], ci)
    dollars_buy_u = _rsum_pair(Phi[2], Plo[2], ci)
    dollars_sell_u = _rsum_pair(Phi[3], Plo[3], ci)
    cum_spread_t = _rsum(P32[0], ci).astype(jnp.int64)

    def extrema(prefix_row, base_row):
        big = jnp.iinfo(prefix_row.dtype)
        local = prefix_row - base_row
        m = valid & (sides != 0)
        mx = jax.ops.segment_max(jnp.where(m, local, big.min), bar_id,
                                 num_segments=n_bars, indices_are_sorted=True)
        mn = jax.ops.segment_min(jnp.where(m, local, big.max), bar_id,
                                 num_segments=n_bars, indices_are_sorted=True)
        return mn, mx

    ct_min, ct_max = extrema(P32[1], B32[0])
    cvu_min, cvu_max = extrema(combine_i64(Phi[4], Plo[4]), B64[0])
    cdu_min, cdu_max = extrema(combine_i64(Phi[5], Plo[5]), B64[1])

    # per-trade spread back from its prefix row (shift-subtract, no gather)
    spread_t = P32[0] - jnp.concatenate([jnp.zeros((1,), jnp.int32), P32[0][:-1]])
    max_spread_t = jax.ops.segment_max(
        jnp.where(valid, spread_t, jnp.int32(-1)), bar_id,
        num_segments=n_bars, indices_are_sorted=True)
    max_spread_t = jnp.maximum(max_spread_t, 0).astype(jnp.int64)

    return (ticks_buy, ticks_sell, volume_buy_u, volume_sell_u,
            dollars_buy_u, dollars_sell_u, max_spread_t, cum_spread_t,
            ct_min, ct_max, cvu_min, cvu_max, cdu_min, cdu_max)


def directional_q_device(price_ticks, amount_units, ci, sides):
    """On-device directional pipeline; returns raw integer device arrays."""
    rows64, rows32 = _directional_pre(price_ticks, amount_units, ci, sides)
    Phi, Plo = fast_cumsum_cols(rows64, as_pair=True)
    del rows64
    P32 = fast_cumsum_cols(rows32)
    del rows32
    b64, b32 = _directional_mid(Phi, Plo, P32, ci)
    B64 = fast_cumsum_cols(b64)
    del b64
    B32 = fast_cumsum_cols(b32)
    del b32
    return _directional_post(Phi, Plo, P32, B64, B32, ci, sides)


_directional_q_device = directional_q_device


def comp_bar_directional_features_q(price_ticks, amount_units, ci, sides,
                                    tick_size, amount_scale):
    """Integer-exact directional features; host-side unit conversion."""
    raw = directional_q_device(price_ticks, amount_units, ci, sides)
    (ticks_buy, ticks_sell, volume_buy_u, volume_sell_u, dollars_buy_u,
     dollars_sell_u, max_spread_t, cum_spread_t, ct_min, ct_max,
     cvu_min, cvu_max, cdu_min, cdu_max) = jax.device_get(raw)

    ts, asc = float(tick_size), float(amount_scale)
    big64 = np.iinfo(np.int64)
    total_ticks = ticks_buy + ticks_sell
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_spread = cum_spread_t.astype(np.float64) * ts / total_ticks

    def scale_minmax(mn, mx, factor):
        # empty bars carry int64 sentinels -> reference's ±1e9 init values
        mnf = np.where(mn == big64.max, 1e9,
                       np.minimum(mn.astype(np.float64) * factor, 1e9))
        mxf = np.where(mx == big64.min, -1e9,
                       np.maximum(mx.astype(np.float64) * factor, -1e9))
        return mnf, mxf

    cv_min, cv_max = scale_minmax(cvu_min, cvu_max, asc)
    cd_min, cd_max = scale_minmax(cdu_min, cdu_max, asc * ts)
    big32 = np.iinfo(np.int32)
    ct_min_o = np.where(ct_min == big32.max, 10**9,
                        np.minimum(ct_min.astype(np.int64), 10**9))
    ct_max_o = np.where(ct_max == big32.min, -10**9,
                        np.maximum(ct_max.astype(np.int64), -10**9))

    return {
        "ticks_buy": ticks_buy,
        "ticks_sell": ticks_sell,
        "volume_buy": (volume_buy_u.astype(np.float64) * asc).astype(np.float32),
        "volume_sell": (volume_sell_u.astype(np.float64) * asc).astype(np.float32),
        "dollars_buy": (dollars_buy_u.astype(np.float64) * asc * ts).astype(np.float32),
        "dollars_sell": (dollars_sell_u.astype(np.float64) * asc * ts).astype(np.float32),
        "mean_spread": mean_spread.astype(np.float32),
        "max_spread": (max_spread_t.astype(np.float64) * ts).astype(np.float32),
        "cum_ticks_min": ct_min_o,
        "cum_ticks_max": ct_max_o,
        "cum_volume_min": cv_min.astype(np.float32),
        "cum_volume_max": cv_max.astype(np.float32),
        "cum_dollars_min": cd_min.astype(np.float32),
        "cum_dollars_max": cd_max.astype(np.float32),
    }


# ---------------------------------------------------------------------------
# Trade-size features
# ---------------------------------------------------------------------------

@jax.jit
def _trade_size_pre(amount_units, thr_units_f32_bars, ci):
    """Rows: i64 [units, marks]; f32 per-trade threshold delta row."""
    n = amount_units.shape[0]
    marks = _marks_row(ci, n, jnp.int32)
    starts = jnp.clip(ci[:-1] + 1, 0, n - 1)
    thr_safe = jnp.where(jnp.isfinite(thr_units_f32_bars), thr_units_f32_bars,
                         jnp.float32(3e38))
    deltas = jnp.diff(jnp.concatenate([jnp.zeros((1,), jnp.float32), thr_safe]))
    thr_row = jnp.zeros((n,), jnp.float32).at[starts].add(deltas)
    return amount_units[None, :], marks[None, :], thr_row[None, :]


@jax.jit
def _trade_size_block_row(amount_units, thr_t):
    over = amount_units.astype(jnp.float32) > thr_t[0]
    return jnp.where(over, amount_units, 0)[None, :]


@jax.jit
def _trade_size_post(amounts_f32, ci, Phi, Plo, Pmarks, PBhi, PBlo):
    n = amounts_f32.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = _bar_axis(Pmarks[0], ci, n)
    counts = range_count(ci)

    total_u = _rsum_pair(Phi[0], Plo[0], ci)
    block_u = _rsum_pair(PBhi[0], PBlo[0], ci)
    sq = amounts_f32 * amounts_f32
    sumsq = jax.ops.segment_sum(jnp.where(valid, sq, 0.0), bar_id,
                                num_segments=n_bars, indices_are_sorted=True)
    sorted_amt = sorted_segments(amounts_f32, bar_id, valid, n_bars)
    offsets = ci[:-1] - ci[0]
    q_a, q_b, q_lo = segment_quantile_pair(sorted_amt, offsets, counts, 0.95)
    return total_u, block_u, sumsq, q_a, q_b, q_lo, counts


def comp_bar_trade_size_features_q(amount_units, amounts_f32, theta, ci,
                                   theta_mult, amount_scale):
    """Trade-size features; host-side log1p/unit conversion."""
    theta = np.asarray(theta, np.float64)
    thr = theta * float(theta_mult)
    thr_units = np.where(thr > 0, thr / float(amount_scale), np.inf)

    units_row, marks, thr_row = _trade_size_pre(
        amount_units, jnp.asarray(thr_units, jnp.float32), ci)
    Phi, Plo = fast_cumsum_cols(units_row, as_pair=True)
    Pmarks = fast_cumsum_cols(marks)
    thr_t = fast_cumsum_cols(thr_row)
    PBhi, PBlo = fast_cumsum_cols(
        _trade_size_block_row(amount_units, thr_t), as_pair=True)
    raw = _trade_size_post(amounts_f32, ci, Phi, Plo, Pmarks, PBhi, PBlo)
    total_u, block_u, sumsq, q_a, q_b, q_lo, counts = jax.device_get(raw)

    pos = 0.95 * (np.maximum(counts, 1) - 1).astype(np.float64)
    frac = pos - q_lo
    p95 = q_a.astype(np.float64) * (1.0 - frac) + q_b.astype(np.float64) * frac

    asc = float(amount_scale)
    empty = counts == 0
    total = total_u.astype(np.float64) * asc
    mean = total / np.maximum(counts, 1)

    base_nan = empty | (theta == 0.0)
    safe_thr = np.where(thr > 0, thr, 1.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_size_rel = np.where(base_nan, np.nan, np.log1p(mean / safe_thr))
        size_95_rel = np.where(base_nan, np.nan, np.log1p(p95 / safe_thr))
        vol_nan = base_nan | (total_u == 0)
        safe_total = np.where(total > 0, total, 1.0)
        pct_block = np.where(vol_nan, np.nan,
                             block_u.astype(np.float64) * asc / safe_total)
        gini = np.where(vol_nan, np.nan,
                        1.0 - sumsq.astype(np.float64) / (safe_total ** 2))
        gini = np.where(vol_nan, np.nan, np.where(counts == 1, 0.0, gini))

    return {
        "mean_size_rel": mean_size_rel.astype(np.float32),
        "size_95_rel": size_95_rel.astype(np.float32),
        "pct_block": pct_block.astype(np.float32),
        "size_gini": gini.astype(np.float32),
    }


# ---------------------------------------------------------------------------
# Fused OHLCV + directional pipeline (bench / batch path): one pre-jit,
# two multi-column scans, one mid-jit, one base scan, one post-jit
# ---------------------------------------------------------------------------

@jax.jit
def _products_pre(price_ticks, amount_units, ci, sides):
    n = price_ticks.shape[0]
    s64 = sides.astype(jnp.int64)
    is_buy = s64 == 1
    is_sell = s64 == -1
    dollars = price_ticks.astype(jnp.int64) * amount_units

    prev_side = jnp.roll(sides, 1)
    prev_ticks = jnp.roll(price_ticks, 1)
    idx = jnp.arange(n, dtype=jnp.int64)
    valid = (idx > ci[0]) & (idx <= ci[-1])
    single = valid & _single_trade_bar_mask(ci, n)
    sign_change = jnp.where(single, sides != 0, sides != prev_side)
    spread32 = jnp.where(sign_change,
                         jnp.abs(price_ticks - prev_ticks), 0).astype(jnp.int32)
    sv = jnp.where(valid, s64, 0)

    rows64 = jnp.stack([
        amount_units,                           # 0 total volume
        dollars,                                # 1 total dollars
        jnp.where(is_buy, amount_units, 0),     # 2
        jnp.where(is_sell, amount_units, 0),    # 3
        jnp.where(is_buy, dollars, 0),          # 4
        jnp.where(is_sell, dollars, 0),         # 5
        sv * amount_units,                      # 6
        sv * dollars,                           # 7
    ])
    rows32 = jnp.stack([
        _marks_row(ci, n, jnp.int32),           # 0
        spread32,                               # 1
        sv.astype(jnp.int32),                   # 2
        is_buy.astype(jnp.int32),               # 3
        is_sell.astype(jnp.int32),              # 4
    ])
    return rows64, rows32


@jax.jit
def _products_mid(Phi, Plo, P32, ci):
    n = P32.shape[1]
    starts = jnp.clip(ci[:-1] + 1, 0, n - 1)

    def delta_row_pair(hi_row, lo_row):
        totals = _rsum_pair(hi_row, lo_row, ci)
        deltas = jnp.concatenate([jnp.zeros((1,), jnp.int64), totals[:-1]])
        return jnp.zeros((n,), jnp.int64).at[starts].add(deltas)

    def delta_row32(row):
        totals = _rsum(row, ci)
        deltas = jnp.concatenate([jnp.zeros((1,), row.dtype), totals[:-1]])
        return jnp.zeros((n,), row.dtype).at[starts].add(deltas)

    b64 = jnp.stack([delta_row_pair(Phi[6], Plo[6]),
                     delta_row_pair(Phi[7], Plo[7])])
    b32 = delta_row32(P32[2])[None, :]
    return b64, b32


@jax.jit
def _products_post(price_ticks, amounts_f32, ci, sides, Phi, Plo, P32,
                   B64, B32):
    n = price_ticks.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = _bar_axis(P32[0], ci, n)
    counts = range_count(ci)

    # --- OHLCV ---
    end_idx = _wrap_idx(ci[1:], n)
    first_idx = _wrap_idx(jnp.minimum(ci[:-1] + 1, n - 1), n)
    close_t = price_ticks[end_idx]
    open_t = jnp.where(counts == 0, close_t, price_ticks[first_idx])
    big32 = jnp.iinfo(jnp.int32)
    high_t = jax.ops.segment_max(
        jnp.where(valid, price_ticks, big32.min), bar_id,
        num_segments=n_bars, indices_are_sorted=True)
    low_t = jax.ops.segment_min(
        jnp.where(valid, price_ticks, big32.max), bar_id,
        num_segments=n_bars, indices_are_sorted=True)
    high_t = jnp.where(counts == 0, close_t, high_t)
    low_t = jnp.where(counts == 0, close_t, low_t)
    vol_u = _rsum_pair(Phi[0], Plo[0], ci)
    dollar_u = _rsum_pair(Phi[1], Plo[1], ci)
    sorted_amt = sorted_segments(amounts_f32, bar_id, valid, n_bars)
    offsets = ci[:-1] - ci[0]
    med_a, med_b = segment_median_pair(sorted_amt, offsets, counts)

    # --- directional ---
    ticks_buy = _rsum(P32[3], ci).astype(jnp.int64)
    ticks_sell = _rsum(P32[4], ci).astype(jnp.int64)
    volume_buy_u = _rsum_pair(Phi[2], Plo[2], ci)
    volume_sell_u = _rsum_pair(Phi[3], Plo[3], ci)
    dollars_buy_u = _rsum_pair(Phi[4], Plo[4], ci)
    dollars_sell_u = _rsum_pair(Phi[5], Plo[5], ci)
    cum_spread_t = _rsum(P32[1], ci).astype(jnp.int64)

    def extrema(prefix_row, base_row):
        big = jnp.iinfo(prefix_row.dtype)
        local = prefix_row - base_row
        m = valid & (sides != 0)
        mx = jax.ops.segment_max(jnp.where(m, local, big.min), bar_id,
                                 num_segments=n_bars, indices_are_sorted=True)
        mn = jax.ops.segment_min(jnp.where(m, local, big.max), bar_id,
                                 num_segments=n_bars, indices_are_sorted=True)
        return mn, mx

    ct_min, ct_max = extrema(P32[2], B32[0])
    cvu_min, cvu_max = extrema(combine_i64(Phi[6], Plo[6]), B64[0])
    cdu_min, cdu_max = extrema(combine_i64(Phi[7], Plo[7]), B64[1])

    spread_t = P32[1] - jnp.concatenate([jnp.zeros((1,), jnp.int32), P32[1][:-1]])
    max_spread_t = jax.ops.segment_max(
        jnp.where(valid, spread_t, jnp.int32(-1)), bar_id,
        num_segments=n_bars, indices_are_sorted=True)
    max_spread_t = jnp.maximum(max_spread_t, 0).astype(jnp.int64)

    return (open_t, high_t, low_t, close_t, vol_u, dollar_u, counts,
            med_a, med_b, ticks_buy, ticks_sell, volume_buy_u,
            volume_sell_u, dollars_buy_u, dollars_sell_u, max_spread_t,
            cum_spread_t, ct_min, ct_max, cvu_min, cvu_max, cdu_min, cdu_max)


def bar_products_q_device(price_ticks, amount_units, amounts_f32, ci, sides):
    """Fused OHLCV + directional device pipeline (6 dispatches total)."""
    rows64, rows32 = _products_pre(price_ticks, amount_units, ci, sides)
    Phi, Plo = fast_cumsum_cols(rows64, as_pair=True)
    del rows64
    P32 = fast_cumsum_cols(rows32)
    del rows32
    b64, b32 = _products_mid(Phi, Plo, P32, ci)
    B64 = fast_cumsum_cols(b64)
    del b64
    B32 = fast_cumsum_cols(b32)
    del b32
    return _products_post(price_ticks, amounts_f32, ci, sides,
                          Phi, Plo, P32, B64, B32)

"""Integer-exact bar aggregations — the TPU fast path.

Same semantics as :mod:`finmlkit_tpu.bar.aggregate` (the f64 reference
path used on CPU and in parity tests), recast for this TPU's performance
profile, where three rules hold:

1. integer and f32 ops compile in seconds and run at HBM bandwidth;
   **any f64 multiply/divide/scan compiles pathologically slowly**
   (minutes per program) — so device kernels below contain *no* f64 ops;
2. random gathers (searchsorted, x[bar_id]) are the slowest executing
   primitive — per-trade values of per-bar quantities are materialized
   with scatter+cumsum "delta forward-fills" instead of gathers;
3. int64 prefix sums are exact, including two's-complement wraparound
   (differences at bar boundaries stay exact while any single bar's
   total fits int64).

Device kernels return *raw integer* per-bar outputs; thin host wrappers
(`comp_bar_*_q`) convert to the reference's price/amount units with
numpy f64 on (tiny) per-bar arrays.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_scan import fast_cumsum
from ..ops.segment import (
    bar_ids_from_close_indices,
    range_count,
    segment_median_pair,
    segment_quantile_pair,
    sorted_segments,
)


def _wrap_idx(idx, n):
    return jnp.where(idx < 0, idx + n, idx)


def _range_sum_i64(x_i64, ci):
    p = jnp.concatenate([jnp.zeros((1,), jnp.int64), fast_cumsum(x_i64)])
    return p[ci[1:] + 1] - p[ci[:-1] + 1]


def _single_trade_bar_mask(ci, n):
    """Per-trade mask of trades that form a one-trade bar (gather-free)."""
    one = jnp.diff(ci) == 1
    pos = jnp.where(one, ci[1:], n)  # close index of each single-trade bar
    m = jnp.zeros((n + 1,), jnp.bool_).at[jnp.clip(pos, 0, n)].set(True)
    return m[:n]


@jax.jit
def _ohlcv_q_device(price_ticks, amount_units, amounts_f32, ci):
    n = price_ticks.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = bar_ids_from_close_indices(ci, n)

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

    vol_u = _range_sum_i64(amount_units, ci)
    dollar_u = _range_sum_i64(price_ticks.astype(jnp.int64) * amount_units, ci)

    sorted_amt = sorted_segments(amounts_f32, bar_id, valid, n_bars)
    offsets = ci[:-1] - ci[0]
    med_a, med_b = segment_median_pair(sorted_amt, offsets, counts)

    return open_t, high_t, low_t, close_t, vol_u, dollar_u, counts, med_a, med_b


def comp_bar_ohlcv_q(price_ticks, amount_units, amounts_f32, ci,
                     tick_size, amount_scale):
    """Integer-exact OHLCV; unit conversion happens host-side in f64."""
    raw = _ohlcv_q_device(price_ticks, amount_units, amounts_f32, ci)
    (open_t, high_t, low_t, close_t, vol_u, dollar_u, counts,
     med_a, med_b) = map(np.asarray, raw)
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


def _segment_local_cumsum(contrib_i64, ci, bar_id, n_bars):
    """Within-bar running cumsum, gather-free.

    global prefix P minus a forward-filled per-bar base; the base deltas
    at bar starts are exactly the previous bar's totals, so the fill is a
    scatter of per-bar sums + one cumsum (no per-trade gathers).
    """
    n = contrib_i64.shape[0]
    p = fast_cumsum(contrib_i64)                     # inclusive global prefix
    totals = _range_sum_i64(contrib_i64, ci)         # per-bar sums
    starts = jnp.clip(ci[:-1] + 1, 0, n - 1)
    deltas = jnp.concatenate([jnp.zeros((1,), jnp.int64), totals[:-1]])
    base = fast_cumsum(jnp.zeros((n,), jnp.int64).at[starts].add(deltas))
    return p - base


@jax.jit
def _directional_q_device(price_ticks, amount_units, ci, sides):
    n = price_ticks.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = bar_ids_from_close_indices(ci, n)

    s = sides.astype(jnp.int64)
    is_buy = s == 1
    is_sell = s == -1
    dollars_u = price_ticks.astype(jnp.int64) * amount_units

    def rsum(x):
        return _range_sum_i64(x, ci)

    ticks_buy = rsum(is_buy.astype(jnp.int64))
    ticks_sell = rsum(is_sell.astype(jnp.int64))
    volume_buy_u = rsum(jnp.where(is_buy, amount_units, 0))
    volume_sell_u = rsum(jnp.where(is_sell, amount_units, 0))
    dollars_buy_u = rsum(jnp.where(is_buy, dollars_u, 0))
    dollars_sell_u = rsum(jnp.where(is_sell, dollars_u, 0))

    # --- spreads on integer tick diffs (single-trade bars via scatter) ---
    prev_side = jnp.roll(s, 1)
    prev_ticks = jnp.roll(price_ticks, 1)
    single = valid & _single_trade_bar_mask(ci, n)
    sign_change = jnp.where(single, s != 0, s != prev_side)
    spread_t = jnp.where(sign_change,
                         jnp.abs(price_ticks.astype(jnp.int64)
                                 - prev_ticks.astype(jnp.int64)), 0)
    max_spread_t = jax.ops.segment_max(
        jnp.where(valid, spread_t, jnp.int64(-1)), bar_id,
        num_segments=n_bars, indices_are_sorted=True)
    max_spread_t = jnp.maximum(max_spread_t, 0)
    cum_spread_t = rsum(spread_t)

    # --- running cum-imbalance extrema (gather-free local cumsums) ---
    def extrema(contrib_i64):
        local = _segment_local_cumsum(jnp.where(valid, contrib_i64, 0),
                                      ci, bar_id, n_bars)
        m = valid & (s != 0)
        big = jnp.iinfo(jnp.int64)
        mx = jax.ops.segment_max(jnp.where(m, local, big.min), bar_id,
                                 num_segments=n_bars, indices_are_sorted=True)
        mn = jax.ops.segment_min(jnp.where(m, local, big.max), bar_id,
                                 num_segments=n_bars, indices_are_sorted=True)
        return mn, mx

    ct_min, ct_max = extrema(s)
    cvu_min, cvu_max = extrema(jnp.where(s != 0, s * amount_units, 0))
    cdu_min, cdu_max = extrema(jnp.where(s != 0, s * dollars_u, 0))

    return (ticks_buy, ticks_sell, volume_buy_u, volume_sell_u,
            dollars_buy_u, dollars_sell_u, max_spread_t, cum_spread_t,
            ct_min, ct_max, cvu_min, cvu_max, cdu_min, cdu_max)


def comp_bar_directional_features_q(price_ticks, amount_units, ci, sides,
                                    tick_size, amount_scale):
    """Integer-exact directional features; host-side unit conversion."""
    raw = _directional_q_device(price_ticks, amount_units, ci, sides)
    (ticks_buy, ticks_sell, volume_buy_u, volume_sell_u, dollars_buy_u,
     dollars_sell_u, max_spread_t, cum_spread_t, ct_min, ct_max,
     cvu_min, cvu_max, cdu_min, cdu_max) = map(np.asarray, raw)

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
    ct_min_o = np.where(ct_min == big64.max, 10**9, np.minimum(ct_min, 10**9))
    ct_max_o = np.where(ct_max == big64.min, -10**9, np.maximum(ct_max, -10**9))

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


@jax.jit
def _trade_size_q_device(amount_units, amounts_f32, thr_units_f32, ci):
    """thr_units_f32: per-bar block threshold in amount units (f32;
    +inf disables). Gather-free per-trade thresholds via delta fill."""
    n = amount_units.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = bar_ids_from_close_indices(ci, n)
    counts = range_count(ci)

    total_u = _range_sum_i64(amount_units, ci)

    # per-trade threshold: forward-fill per-bar values by scatter deltas
    starts = jnp.clip(ci[:-1] + 1, 0, n - 1)
    thr_safe = jnp.where(jnp.isfinite(thr_units_f32), thr_units_f32,
                         jnp.float32(3e38))
    deltas = jnp.diff(jnp.concatenate([jnp.zeros((1,), jnp.float32), thr_safe]))
    thr_t = fast_cumsum(jnp.zeros((n,), jnp.float32).at[starts].add(deltas))
    over = amount_units.astype(jnp.float32) > thr_t
    block_u = _range_sum_i64(jnp.where(over, amount_units, 0), ci)

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
    total_u, block_u, sumsq, q_a, q_b, q_lo, counts = map(
        np.asarray, _trade_size_q_device(
            amount_units, amounts_f32, jnp.asarray(thr_units, jnp.float32), ci))
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

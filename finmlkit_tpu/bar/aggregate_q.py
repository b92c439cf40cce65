"""Integer-exact bar aggregations — the TPU fast path.

Same semantics as :mod:`finmlkit_tpu.bar.aggregate` (which carries the
full f64 reference parity, used on CPU and in tests), recast onto the
TPU's fast integer/f32 units:

- sums of amounts / dollars / tick counts: int64 prefix-sum differences
  (exact, incl. two's-complement wraparound past 2^63 — see
  bar/quantize.py) or int64 segment sums
- extrema: int32/int64 segment max/min
- order statistics: the existing one-sort f32 path
- per-bar scalar conversions to f64 prices: elementwise VPU ops (fast;
  only f64 *scans* are pathological on this TPU)

Accuracy vs the f64 reference: price-derived outputs are *exact* (integer
ticks); amount-derived sums are exact in units of 1e-8, i.e. within
5e-9·n_trades_in_bar absolute of the f64 reference — far below the f32
output precision of the reference's own outputs.
"""
import jax
import jax.numpy as jnp

from ..ops.segment import (
    bar_ids_from_close_indices,
    range_count,
    segment_median_sorted,
    segment_quantile_sorted,
    sorted_segments,
)


def _wrap_idx(idx, n):
    return jnp.where(idx < 0, idx + n, idx)


def _range_sum_i64(x_i64, ci):
    p = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(x_i64)])
    return p[ci[1:] + 1] - p[ci[:-1] + 1]


@jax.jit
def comp_bar_ohlcv_q(price_ticks, amount_units, amounts_f32, ci,
                     tick_size, amount_scale):
    """Integer-exact OHLCV (semantics of aggregate.comp_bar_ohlcv)."""
    n = price_ticks.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = bar_ids_from_close_indices(ci, n)

    counts = range_count(ci)
    empty = counts == 0
    end_idx = _wrap_idx(ci[1:], n)
    first_idx = _wrap_idx(jnp.minimum(ci[:-1] + 1, n - 1), n)

    close_t = price_ticks[end_idx]
    open_t = jnp.where(empty, close_t, price_ticks[first_idx])

    big = jnp.iinfo(jnp.int32)
    high_t = jax.ops.segment_max(
        jnp.where(valid, price_ticks, big.min), bar_id,
        num_segments=n_bars, indices_are_sorted=True)
    low_t = jax.ops.segment_min(
        jnp.where(valid, price_ticks, big.max), bar_id,
        num_segments=n_bars, indices_are_sorted=True)
    high_t = jnp.where(empty, close_t, high_t)
    low_t = jnp.where(empty, close_t, low_t)

    vol_u = _range_sum_i64(amount_units, ci)
    dollar_u = _range_sum_i64(price_ticks.astype(jnp.int64) * amount_units, ci)

    # per-bar conversions (f64 elementwise only)
    ts = jnp.float64(tick_size)
    asc = jnp.float64(amount_scale)
    vol = vol_u.astype(jnp.float64) * asc
    vwap = jnp.where(vol_u > 0,
                     dollar_u.astype(jnp.float64)
                     / jnp.where(vol_u > 0, vol_u, 1).astype(jnp.float64) * ts,
                     0.0)

    sorted_amt = sorted_segments(amounts_f32, bar_id, valid, n_bars)
    offsets = ci[:-1] - ci[0]
    median = segment_median_sorted(sorted_amt, offsets, counts)

    return {
        "open": open_t.astype(jnp.float64) * ts,
        "high": high_t.astype(jnp.float64) * ts,
        "low": low_t.astype(jnp.float64) * ts,
        "close": close_t.astype(jnp.float64) * ts,
        "volume": jnp.where(empty, 0.0, vol).astype(jnp.float32),
        "vwap": jnp.where(empty, 0.0, vwap),
        "trades": counts,
        "median_trade_size": jnp.where(empty, 0.0, median),
    }


@jax.jit
def comp_bar_directional_features_q(price_ticks, amount_units, ci, sides,
                                    tick_size, amount_scale):
    """Integer-exact directional features (semantics of
    aggregate.comp_bar_directional_features)."""
    n = price_ticks.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = bar_ids_from_close_indices(ci, n)
    counts = range_count(ci)

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

    # --- spreads on integer tick diffs ---
    prev_side = jnp.roll(s, 1)
    prev_ticks = jnp.roll(price_ticks, 1)
    count_of_bar = counts[bar_id]
    single = valid & (count_of_bar == 1)
    sign_change = jnp.where(single, s != 0, s != prev_side)
    spread_t = jnp.where(sign_change,
                         jnp.abs(price_ticks.astype(jnp.int64)
                                 - prev_ticks.astype(jnp.int64)), 0)
    max_spread_t = jax.ops.segment_max(
        jnp.where(valid, spread_t, jnp.int64(-1)), bar_id,
        num_segments=n_bars, indices_are_sorted=True)
    max_spread_t = jnp.maximum(max_spread_t, 0)
    cum_spread_t = rsum(spread_t)

    # --- running cum-imbalance extrema (wrap-exact int64 prefixes) ---
    def extrema(contrib_i64, clamp):
        pc = jnp.concatenate([jnp.zeros((1,), jnp.int64),
                              jnp.cumsum(jnp.where(valid, contrib_i64, 0))])
        base = pc[ci[:-1] + 1]
        local = pc[1:] - base[bar_id]
        m = valid & (s != 0)
        big = jnp.iinfo(jnp.int64)
        mx = jax.ops.segment_max(jnp.where(m, local, big.min), bar_id,
                                 num_segments=n_bars, indices_are_sorted=True)
        mn = jax.ops.segment_min(jnp.where(m, local, big.max), bar_id,
                                 num_segments=n_bars, indices_are_sorted=True)
        mx = jnp.maximum(mx, -clamp)
        mn = jnp.minimum(mn, clamp)
        return mn, mx

    ct_min, ct_max = extrema(s, jnp.int64(10**9))
    ts64 = jnp.float64(tick_size)
    asc = jnp.float64(amount_scale)
    # volume extrema in units; clamp at the reference's 1e9 init AFTER scaling
    cvu_min, cvu_max = extrema(jnp.where(s != 0, s * amount_units, 0),
                               jnp.iinfo(jnp.int64).max)
    cdu_min, cdu_max = extrema(jnp.where(s != 0, s * dollars_u, 0),
                               jnp.iinfo(jnp.int64).max)
    cv_min = jnp.minimum(cvu_min.astype(jnp.float64) * asc, 1e9)
    cv_max = jnp.maximum(cvu_max.astype(jnp.float64) * asc, -1e9)
    cd_min = jnp.minimum(cdu_min.astype(jnp.float64) * asc * ts64, 1e9)
    cd_max = jnp.maximum(cdu_max.astype(jnp.float64) * asc * ts64, -1e9)

    total_ticks = ticks_buy + ticks_sell
    mean_spread = (cum_spread_t.astype(jnp.float64) * ts64
                   / total_ticks.astype(jnp.float64))

    return {
        "ticks_buy": ticks_buy,
        "ticks_sell": ticks_sell,
        "volume_buy": (volume_buy_u.astype(jnp.float64) * asc).astype(jnp.float32),
        "volume_sell": (volume_sell_u.astype(jnp.float64) * asc).astype(jnp.float32),
        "dollars_buy": (dollars_buy_u.astype(jnp.float64) * asc * ts64).astype(jnp.float32),
        "dollars_sell": (dollars_sell_u.astype(jnp.float64) * asc * ts64).astype(jnp.float32),
        "mean_spread": mean_spread.astype(jnp.float32),
        "max_spread": (max_spread_t.astype(jnp.float64) * ts64).astype(jnp.float32),
        "cum_ticks_min": ct_min,
        "cum_ticks_max": ct_max,
        "cum_volume_min": cv_min.astype(jnp.float32),
        "cum_volume_max": cv_max.astype(jnp.float32),
        "cum_dollars_min": cd_min.astype(jnp.float32),
        "cum_dollars_max": cd_max.astype(jnp.float32),
    }


@jax.jit
def comp_bar_trade_size_features_q(amount_units, amounts_f32, theta, ci,
                                   theta_mult, amount_scale):
    """Integer/f32 trade-size features (semantics of
    aggregate.comp_bar_trade_size_features)."""
    n = amount_units.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = bar_ids_from_close_indices(ci, n)
    counts = range_count(ci)
    empty = counts == 0

    asc = jnp.float64(amount_scale)
    total_u = _range_sum_i64(amount_units, ci)
    total = total_u.astype(jnp.float64) * asc
    mean = total / jnp.maximum(counts, 1).astype(jnp.float64)

    thr = theta.astype(jnp.float64) * theta_mult
    thr_u = jnp.where(jnp.isfinite(thr), thr / amount_scale, jnp.inf)
    thr_t = thr_u[bar_id]
    block_u = _range_sum_i64(
        jnp.where(amount_units.astype(jnp.float64) > thr_t, amount_units, 0), ci)

    # sum of squares in f32 (units^2 can overflow int64)
    a32 = amounts_f32
    sq = (a32 * a32).astype(jnp.float32)
    sumsq = jax.ops.segment_sum(jnp.where(valid, sq, 0.0), bar_id,
                                num_segments=n_bars, indices_are_sorted=True)

    sorted_amt = sorted_segments(a32, bar_id, valid, n_bars)
    offsets = ci[:-1] - ci[0]
    p95 = segment_quantile_sorted(sorted_amt, offsets, counts, 0.95)

    base_nan = empty | (theta == 0.0)
    nanv = jnp.float64(jnp.nan)
    safe_thr = jnp.where(thr > 0, thr, 1.0)
    mean_size_rel = jnp.where(base_nan, nanv, jnp.log1p(mean / safe_thr))
    size_95_rel = jnp.where(base_nan, nanv, jnp.log1p(p95 / safe_thr))

    vol_nan = base_nan | (total_u == 0)
    safe_total = jnp.where(total > 0, total, 1.0)
    pct_block = jnp.where(vol_nan, nanv,
                          block_u.astype(jnp.float64) * asc / safe_total)
    gini = jnp.where(vol_nan, nanv,
                     1.0 - sumsq.astype(jnp.float64) / (safe_total * safe_total))
    gini = jnp.where(vol_nan, nanv, jnp.where(counts == 1, 0.0, gini))

    return {
        "mean_size_rel": mean_size_rel.astype(jnp.float32),
        "size_95_rel": size_95_rel.astype(jnp.float32),
        "pct_block": pct_block.astype(jnp.float32),
        "size_gini": gini.astype(jnp.float32),
    }

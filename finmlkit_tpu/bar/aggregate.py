"""Per-bar aggregations over the trade axis.

TPU-native re-design of the per-bar ``prange`` kernels in
/root/reference/finmlkit/bar/base.py:

- ``comp_bar_ohlcv``                (base.py:306-407)
- ``comp_bar_directional_features`` (base.py:409-546)
- ``comp_bar_trade_size_features``  (base.py:549-612)

Instead of a parallel loop over bars with an inner loop over trades, every
output is a segment reduction over the fixed trade axis: sums become
prefix-sum differences at the bar boundaries, extrema become sorted-segment
reductions, and order statistics (median / p95) are gathers into one
globally sorted ``(bar_id, amount)`` key array. Everything is O(n) or
O(n log n) vectorized work with no data-dependent shapes, so the whole
pipeline jit-compiles once per trade-count bucket.

Bar semantics match the reference exactly: bar i covers trades
``(ci[i], ci[i+1]]`` (start-exclusive, end-inclusive); empty bars
(``ci[i] == ci[i+1]``) are filled with the close price at ``ci[i+1]``.
Negative anchor indices (``ci[0] == -1`` for the typical unaligned first
time bar) wrap around like NumPy/Numba indexing.
"""
import jax
import jax.numpy as jnp

from ..ops.segment import (
    bar_ids_from_close_indices,
    range_sum,
    range_count,
    segment_max_ranges,
    segment_min_ranges,
    sorted_segments,
    segment_median_sorted,
    segment_quantile_sorted,
)


def _wrap_idx(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """NumPy-style negative-index wraparound for gather indices."""
    return jnp.where(idx < 0, idx + n, idx)


@jax.jit
def comp_bar_ohlcv(prices: jnp.ndarray, amounts: jnp.ndarray, ci: jnp.ndarray):
    """OHLCV + VWAP + trade count + median trade size per bar.

    Parity: /root/reference/finmlkit/bar/base.py:306-407.

    :param prices: trade prices (f64).
    :param amounts: trade amounts (f32).
    :param ci: close indices (n_bars+1,); bar i = (ci[i], ci[i+1]].
    :returns: dict of per-bar arrays (open/high/low/close f64, volume f32,
        vwap f64, trades i64, median_trade_size f64).
    """
    n = prices.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = bar_ids_from_close_indices(ci, n)

    counts = range_count(ci)
    empty = counts == 0
    end_idx = _wrap_idx(ci[1:], n)
    first_idx = _wrap_idx(jnp.minimum(ci[:-1] + 1, n - 1), n)

    close_p = prices[end_idx]
    open_p = jnp.where(empty, close_p, prices[first_idx])

    high = segment_max_ranges(prices, bar_id, valid, n_bars)
    low = segment_min_ranges(prices, bar_id, valid, n_bars)
    high = jnp.where(empty, close_p, high)
    low = jnp.where(empty, close_p, low)

    vol = range_sum(amounts, ci, dtype=jnp.float64)
    dollars = range_sum(prices * amounts.astype(jnp.float64), ci)
    vwap = jnp.where(vol > 0.0, dollars / jnp.where(vol > 0.0, vol, 1.0), 0.0)

    amounts32 = amounts.astype(jnp.float32)
    sorted_amt = sorted_segments(amounts32, bar_id, valid, n_bars)
    offsets = ci[:-1] - ci[0]
    median = segment_median_sorted(sorted_amt, offsets, counts)
    median = jnp.where(empty, 0.0, median)

    return {
        "open": open_p,
        "high": high,
        "low": low,
        "close": close_p,
        "volume": jnp.where(empty, 0.0, vol).astype(jnp.float32),
        "vwap": jnp.where(empty, 0.0, vwap),
        "trades": counts,
        "median_trade_size": median,
    }


@jax.jit
def comp_bar_directional_features(prices: jnp.ndarray, amounts: jnp.ndarray,
                                  ci: jnp.ndarray, sides: jnp.ndarray):
    """Buy/sell tick/volume/dollar splits, spreads, cum-imbalance extrema.

    Parity: /root/reference/finmlkit/bar/base.py:409-546, including its
    quirks: a sign-change spread is measured against the previous bar's
    last trade (global ``j-1``, wrapping at j=0); single-trade bars
    compare against side 0; cum-imbalance min/max are tracked only after
    trades with nonzero side and initialise to ±1e9 (not ±inf);
    mean_spread is NaN for empty bars (0/0).
    """
    n = prices.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = bar_ids_from_close_indices(ci, n)
    counts = range_count(ci)

    s = sides.astype(jnp.int64)
    is_buy = (s == 1).astype(jnp.float64)
    is_sell = (s == -1).astype(jnp.float64)
    amt = amounts.astype(jnp.float64)
    dollars = prices * amt

    ticks_buy = range_sum(is_buy, ci).astype(jnp.int64)
    ticks_sell = range_sum(is_sell, ci).astype(jnp.int64)
    volume_buy = range_sum(is_buy * amt, ci)
    volume_sell = range_sum(is_sell * amt, ci)
    dollars_buy = range_sum(is_buy * dollars, ci)
    dollars_sell = range_sum(is_sell * dollars, ci)

    # --- spreads (tick-rule sign change vs previous trade) ---
    prev_side = jnp.roll(s, 1)
    prev_price = jnp.roll(prices, 1)
    count_of_bar = counts[bar_id]  # per-trade count of its bar
    single = valid & (count_of_bar == 1)
    sign_change = jnp.where(single, s != 0, s != prev_side)
    spread = jnp.where(sign_change, jnp.abs(prices - prev_price), 0.0)
    max_spread = segment_max_ranges(spread, bar_id, valid, n_bars)
    max_spread = jnp.maximum(max_spread, 0.0)  # empty bars -> 0
    cum_spread = range_sum(spread, ci)
    mean_spread = cum_spread / (ticks_buy + ticks_sell).astype(jnp.float64)

    # --- running cum-imbalance extrema within bar ---
    signed = s.astype(jnp.float64)
    contrib_t = signed
    contrib_v = signed * amt
    contrib_d = signed * dollars

    def _extrema(contrib):
        pc = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(contrib)])
        base = pc[ci[:-1] + 1]  # cum after previous bar close (0 for ci=-1)
        local = pc[1:] - base[bar_id]  # running cum after each trade
        m = valid & (s != 0)
        mx = jax.ops.segment_max(
            jnp.where(m, local, -jnp.inf), bar_id, num_segments=n_bars,
            indices_are_sorted=True)
        mn = jax.ops.segment_min(
            jnp.where(m, local, jnp.inf), bar_id, num_segments=n_bars,
            indices_are_sorted=True)
        mx = jnp.maximum(mx, -1e9)  # reference init values
        mn = jnp.minimum(mn, 1e9)
        return mn, mx

    ct_min, ct_max = _extrema(contrib_t)
    cv_min, cv_max = _extrema(contrib_v)
    cd_min, cd_max = _extrema(contrib_d)

    return {
        "ticks_buy": ticks_buy,
        "ticks_sell": ticks_sell,
        "volume_buy": volume_buy.astype(jnp.float32),
        "volume_sell": volume_sell.astype(jnp.float32),
        "dollars_buy": dollars_buy.astype(jnp.float32),
        "dollars_sell": dollars_sell.astype(jnp.float32),
        "mean_spread": mean_spread.astype(jnp.float32),
        "max_spread": max_spread.astype(jnp.float32),
        "cum_ticks_min": ct_min.astype(jnp.int64),
        "cum_ticks_max": ct_max.astype(jnp.int64),
        "cum_volume_min": cv_min.astype(jnp.float32),
        "cum_volume_max": cv_max.astype(jnp.float32),
        "cum_dollars_min": cd_min.astype(jnp.float32),
        "cum_dollars_max": cd_max.astype(jnp.float32),
    }


@jax.jit
def comp_bar_trade_size_features(amounts: jnp.ndarray, theta: jnp.ndarray,
                                 ci: jnp.ndarray, theta_mult: float):
    """Relative trade-size stats per bar vs a typical size theta.

    Parity: /root/reference/finmlkit/bar/base.py:549-612 — log1p-scaled
    mean and p95 (NumPy linear-interpolation percentile), block-volume
    percentage, size Gini ``1 - sum((s/V)^2)``. NaN for empty bars and
    where theta == 0; pct_block/gini additionally NaN when total volume
    is 0 (mean/p95 are still emitted in that case, as in the reference).
    """
    n = amounts.shape[0]
    n_bars = ci.shape[0] - 1
    bar_id, valid = bar_ids_from_close_indices(ci, n)
    counts = range_count(ci)
    empty = counts == 0

    amt = amounts.astype(jnp.float64)
    total = range_sum(amt, ci)
    sumsq = range_sum(amt * amt, ci)
    mean = total / jnp.maximum(counts, 1).astype(jnp.float64)

    thr = theta.astype(jnp.float64) * theta_mult
    thr_t = thr[bar_id]  # per-trade threshold of its bar
    block = range_sum(jnp.where(amt > thr_t, amt, 0.0), ci)

    amounts32 = amounts.astype(jnp.float32)
    sorted_amt = sorted_segments(amounts32, bar_id, valid, n_bars)
    offsets = ci[:-1] - ci[0]
    p95 = segment_quantile_sorted(sorted_amt, offsets, counts, 0.95)

    base_nan = empty | (theta == 0.0)
    nanv = jnp.float64(jnp.nan)
    safe_thr = jnp.where(thr > 0, thr, 1.0)
    mean_size_rel = jnp.where(base_nan, nanv, jnp.log1p(mean / safe_thr))
    size_95_rel = jnp.where(base_nan, nanv, jnp.log1p(p95 / safe_thr))

    vol_nan = base_nan | (total == 0.0)
    safe_total = jnp.where(total > 0, total, 1.0)
    pct_block = jnp.where(vol_nan, nanv, block / safe_total)
    gini = jnp.where(vol_nan, nanv, 1.0 - sumsq / (safe_total * safe_total))
    gini = jnp.where(vol_nan, nanv, jnp.where(counts == 1, 0.0, gini))

    return {
        "mean_size_rel": mean_size_rel.astype(jnp.float32),
        "size_95_rel": size_95_rel.astype(jnp.float32),
        "pct_block": pct_block.astype(jnp.float32),
        "size_gini": gini.astype(jnp.float32),
    }

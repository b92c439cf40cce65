"""Trade utilities — module path parity with finmlkit.bar.utils.

The CANONICAL home of the trade-level helpers (side inference, split
merging, tick-size estimation, sorting, footprint export), mirroring the
reference's module layout (/root/reference/finmlkit/bar/utils.py).
``bar.data_model`` re-exports the names its classes use.
"""
import numpy as np
import pandas as pd

def comp_trade_side_vector(prices: np.ndarray) -> np.ndarray:
    """Tick-rule trade side: sign of price change, carrying the previous
    side through unchanged prices. Element 0 is 0 (no previous trade).

    Parity: /root/reference/finmlkit/bar/utils.py:10-46.
    """
    n = len(prices)
    sides = np.zeros(n, dtype=np.int8)
    if n < 2:
        return sides
    dp = np.diff(prices.astype(np.float64))
    sgn = np.sign(dp).astype(np.int8)
    nz = np.abs(dp) > 1e-12
    # forward-fill last nonzero sign
    idx = np.where(nz, np.arange(n - 1), -1)
    np.maximum.accumulate(idx, out=idx)
    filled = np.where(idx >= 0, sgn[np.clip(idx, 0, None)], 0)
    sides[1:] = filled
    return sides


def merge_split_trades(timestamps, prices, amounts, is_buyer_maker=None):
    """Merge split executions (same timestamp, price and side) by summing
    amounts. Inputs must be ordered by (timestamp, id).

    Parity: /root/reference/finmlkit/bar/utils.py:263-329 — EXACT anchor
    semantics: each trade's price is compared against the *group
    anchor's* price with a 1e-8 tolerance (not its neighbor's), so a
    price drifting by sub-tolerance steps still opens a new group once
    it strays >= 1e-8 from the anchor. The vectorized adjacent-pair pass
    is a superset grouping (anchor groups are always sub-segments of
    adjacent groups); groups whose internal deviation from their anchor
    reaches the tolerance — possible only for sub-1e-8 price noise,
    essentially never on tick-gridded exchange data — are re-segmented
    with the reference's greedy walk.
    Side convention from ``is_buyer_maker``: maker-buyer => market sell
    (-1), else market buy (+1).
    """
    n = len(timestamps)
    if n == 0:
        return timestamps, prices, amounts, np.empty(0, dtype=np.int8)
    with_side = is_buyer_maker is not None
    px64 = prices.astype(np.float64, copy=False)

    same_run = np.zeros(n, dtype=bool)  # same (ts, side) as predecessor
    same_run[1:] = timestamps[1:] == timestamps[:-1]
    if with_side:
        same_run[1:] &= is_buyer_maker[1:] == is_buyer_maker[:-1]
    dp = np.zeros(n)
    dp[1:] = np.abs(px64[1:] - px64[:-1])

    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = ~same_run[1:] | (dp[1:] >= 1e-8)

    # The adjacent-pair pass equals the reference's anchor walk unless a
    # same-(ts, side) pair differs by a NONZERO sub-2e-8 step (drifting
    # anchors can then split a merged run, or a zigzag can re-enter the
    # anchor's tolerance across an adjacent split). Exchange prices live
    # on a tick grid, so this triggers only on sub-tolerance noise.
    tiny = same_run & (dp > 0.0) & (dp < 2e-8)
    if tiny.any():
        # exact greedy re-walk of every affected same-(ts, side) run
        run_start = np.flatnonzero(~same_run)
        run_end = np.append(run_start[1:], n)
        affected = np.unique(np.searchsorted(run_start,
                                             np.flatnonzero(tiny),
                                             side="right") - 1)
        for r in affected:
            s, e = run_start[r], run_end[r]
            anchor = px64[s]
            new_group[s + 1:e] = False
            for i in range(s + 1, e):
                if abs(px64[i] - anchor) >= 1e-8:
                    new_group[i] = True
                    anchor = px64[i]

    starts = np.flatnonzero(new_group)
    merged_ts = timestamps[starts]
    merged_px = prices[starts]
    # within-group sequential f32 adds, same order as the reference loop
    merged_amt = np.add.reduceat(amounts.astype(np.float32), starts)
    if with_side:
        merged_side = np.where(is_buyer_maker[starts], -1, 1).astype(np.int8)
    else:
        merged_side = np.empty(0, dtype=np.int8)
    return merged_ts, merged_px, merged_amt, merged_side


def comp_price_tick_size(prices: np.ndarray) -> float:
    """Estimate the smallest price increment via GCD of scaled unique diffs.

    Parity: /root/reference/finmlkit/bar/utils.py:49-81.
    """
    if len(prices) == 0:
        raise ValueError("Empty prices array")
    sample = np.round(prices[: min(10000, len(prices))], decimals=12)
    uniq = np.unique(sample)
    if len(uniq) <= 1:
        return 0.0
    diffs = np.diff(uniq)
    pos = diffs[diffs > 0]
    scale = 10.0 ** (-np.floor(np.log10(np.min(pos))))
    int_px = np.round(uniq * scale).astype(np.int64)
    int_diffs = np.diff(int_px)
    tick_int = int(np.gcd.reduce(int_diffs[int_diffs > 0])) if np.any(int_diffs > 0) else 0
    return tick_int / scale


def comp_trade_side(price: float, prev_price: float, prev_tick: int) -> int:
    """Tick-rule side for one trade. Parity: bar/utils.py:10-23."""
    dp = price - prev_price
    if abs(dp) > 1e-12:
        return int(np.sign(dp))
    return prev_tick


def median3(a, b, c):
    """Median of three. Parity: bar/utils.py:212-224."""
    if a > b:
        a, b = b, a
    if b > c:
        b, c = c, b
    if a > b:
        a, b = b, a
    return b


def check_timestamps_order(timestamps) -> bool:
    """Ascending-order check. Parity: bar/utils.py:227-237."""
    ts = np.asarray(timestamps)
    return bool(np.all(ts[1:] >= ts[:-1]))


def fast_sort_trades(timestamps, prices, amounts, is_buyer_maker=None):
    """Argsort trades by timestamp. Parity: bar/utils.py:239-260."""
    idx = np.argsort(timestamps, kind="stable")
    return (timestamps[idx], prices[idx], amounts[idx],
            is_buyer_maker[idx] if is_buyer_maker is not None else None)


def footprint_to_dataframe(bar_timestamps, price_levels, buy_volumes,
                           sell_volumes, buy_ticks, sell_ticks,
                           buy_imbalance, sell_imbalance, price_tick):
    """Ragged footprint lists -> MultiIndex DataFrame.

    Parity: bar/utils.py:129-209. Dense-footprint users should prefer
    FootprintData.get_df(); this accepts ragged per-bar lists for
    reference-compatible call sites.
    """
    bar_dt = pd.to_datetime(bar_timestamps)
    n_levels = np.array([len(p) for p in price_levels], dtype=np.int64)
    bar_idx = np.repeat(np.arange(len(bar_dt)), n_levels)
    bar_dt_rep = np.repeat(np.asarray(bar_dt), n_levels)

    def cat(parts):
        return np.concatenate([np.asarray(p) for p in parts]) if len(parts) \
            else np.empty(0)

    df = pd.DataFrame({
        "price_level": cat(price_levels) * price_tick,
        "sell_ticks": cat(sell_ticks),
        "buy_ticks": cat(buy_ticks),
        "sell_volume": cat(sell_volumes),
        "buy_volume": cat(buy_volumes),
        "sell_imbalance": cat(sell_imbalance),
        "buy_imbalance": cat(buy_imbalance),
    }, index=pd.MultiIndex.from_arrays([bar_idx, bar_dt_rep],
                                       names=["bar_idx", "bar_datetime_idx"]))
    return df.sort_values(by=["bar_datetime_idx", "price_level"],
                          ascending=[True, False])

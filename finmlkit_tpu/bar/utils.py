"""Trade utilities — drop-in module path parity with finmlkit.bar.utils.

The implementations live in :mod:`finmlkit_tpu.bar.data_model`; this
module mirrors the reference's import surface
(/root/reference/finmlkit/bar/utils.py).
"""
import numpy as np
import pandas as pd

from .data_model import (  # noqa: F401
    comp_price_tick_size,
    comp_trade_side_vector,
    merge_split_trades,
)


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

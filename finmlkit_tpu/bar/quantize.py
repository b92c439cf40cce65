"""Quantization of trades to exact integer grids.

The TPU's fast integer units make integer-tick arithmetic both *exact*
and fast, while f64 scan emulation is pathologically slow to compile on
this hardware. Prices quantize to int32 ticks via the GCD-inferred tick
size (the reference itself does this for footprints, bar/base.py:688-708)
and amounts to int64 units of 1e-8 (sub-satoshi; represents every float32
amount to 5e-9 absolute). All bar sums/extrema then run on integers:

- int64 prefix sums may wrap past 2^63 over a month, but *differences*
  at bar boundaries remain exact (two's-complement wraparound) as long as
  any single bar's total fits in int64 — which holds by a huge margin.
- per-bar outputs convert to f64 prices elementwise (fast on the VPU).
"""
from typing import NamedTuple, Optional

import numpy as np

AMOUNT_SCALE = 1e-8  # units of 1e-8 (sub-satoshi for crypto amounts)


class QuantizedTrades(NamedTuple):
    price_ticks: np.ndarray     # int32
    amount_units: np.ndarray    # int64
    tick_size: float
    amount_scale: float
    exact: bool                 # price quantization verified exact


def quantize_prices(prices: np.ndarray, tick_size: Optional[float] = None):
    """Quantize prices to integer ticks; returns (ticks i32, tick, exact)."""
    from .data_model import comp_price_tick_size
    if tick_size is None:
        tick_size = comp_price_tick_size(prices)
    if not tick_size or tick_size <= 0:
        return None, 0.0, False
    ticks = np.round(prices / tick_size)
    exact = bool(np.max(np.abs(ticks * tick_size - prices)) < 1e-9 * np.maximum(1.0, np.max(np.abs(prices))))
    if not exact or np.max(np.abs(ticks)) >= 2**31 - 1:
        return None, tick_size, False
    return ticks.astype(np.int32), float(tick_size), True


def quantize_amounts(amounts: np.ndarray, scale: float = AMOUNT_SCALE):
    """Quantize (float32) amounts to int64 units of `scale`."""
    units = np.round(amounts.astype(np.float64) / scale)
    if np.max(np.abs(units)) >= 2**62:
        return None, scale, False
    return units.astype(np.int64), float(scale), True


def quantize_trades(prices: np.ndarray, amounts: np.ndarray,
                    tick_size: Optional[float] = None) -> Optional[QuantizedTrades]:
    ticks, tick, ok_p = quantize_prices(prices, tick_size)
    if not ok_p:
        return None
    units, scale, ok_a = quantize_amounts(amounts)
    if not ok_a:
        return None
    return QuantizedTrades(ticks, units, tick, scale, True)

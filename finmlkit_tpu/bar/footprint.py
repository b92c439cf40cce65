"""Dense footprint construction + per-bar order-flow features.

TPU-native re-design of /root/reference/finmlkit/bar/base.py:615-850
(``comp_bar_footprints`` + ``comp_footprint_features``). The reference is
explicitly sequential because of ragged NumbaLists (its TODO at
base.py:661 suggests flat arrays); here footprints are a dense
``(n_bars, L)`` tensor built with one scatter-add over trades, and every
footprint feature is a masked vectorized op over the level axis:

- diagonal bid/ask imbalance flags: shifted comparisons (base.py:795-798)
- longest signed imbalance run: lax.scan over the level axis, vectorized
  across bars (base.py:800-822)
- COT / vp_skew / vp_gini: masked argmax / dot products (base.py:824-848)
"""
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.segment import bar_ids_from_close_indices


@partial(jax.jit, static_argnames=("max_levels",))
def comp_bar_footprints(prices, amounts, ci, sides, price_tick_size,
                        bar_lows, bar_highs, imbalance_factor, *, max_levels: int):
    """Build dense footprint tensors and derived features.

    :param prices/amounts/sides: per-trade arrays.
    :param ci: bar close indices (n_bars+1,).
    :param bar_lows/bar_highs: per-bar price extrema (from the OHLCV pass).
    :param max_levels: static bound for the level axis; must be >=
        max(round(high/tick) - round(low/tick) + 1).
    :returns: dict of dense tensors + per-bar features.
    """
    n = prices.shape[0]
    n_bars = ci.shape[0] - 1
    L = max_levels
    bar_id, valid = bar_ids_from_close_indices(ci, n)

    low = jnp.round(bar_lows / price_tick_size).astype(jnp.int32)
    high = jnp.round(bar_highs / price_tick_size).astype(jnp.int32)
    n_levels = high - low + 1

    # per-trade integer tick level, offset into its bar's level axis
    tick = jnp.round(prices / price_tick_size).astype(jnp.int32)
    lvl = tick - low[bar_id]
    in_range = valid & (lvl >= 0) & (lvl < n_levels[bar_id])
    flat = jnp.where(in_range, bar_id.astype(jnp.int64) * L + lvl, n_bars * L)

    is_buy = (sides == 1) & in_range
    is_sell = (sides == -1) & in_range
    amt = amounts.astype(jnp.float64)

    def scat(x):
        return jax.ops.segment_sum(x, flat, num_segments=n_bars * L + 1)[:-1].reshape(n_bars, L)

    buy_vol = scat(jnp.where(is_buy, amt, 0.0)).astype(jnp.float32)
    sell_vol = scat(jnp.where(is_sell, amt, 0.0)).astype(jnp.float32)
    buy_ticks = scat(is_buy.astype(jnp.int64)).astype(jnp.int32)
    sell_ticks = scat(is_sell.astype(jnp.int64)).astype(jnp.int32)

    return footprint_features_from_tensors(
        low, n_levels, buy_vol, sell_vol, buy_ticks, sell_ticks,
        imbalance_factor)


@jax.jit
def footprint_features_from_tensors(low, n_levels, buy_vol, sell_vol,
                                    buy_ticks, sell_ticks, imbalance_factor):
    """Per-bar footprint features from dense (n_bars, L) tensors.

    Split out of :func:`comp_bar_footprints` so the mesh path
    (parallel/sharded_footprint.py) can psum-combine per-shard partial
    tensors and reuse the identical feature derivation
    (reference: comp_footprint_features, bar/base.py:755-850).
    """
    n_bars, L = buy_vol.shape

    # --- level-axis masks ---
    lgrid = jnp.arange(L, dtype=jnp.int32)[None, :]           # (1, L)
    lmask = lgrid < n_levels[:, None]                          # (n_bars, L)

    # --- diagonal imbalances (ascending table: sell[l] vs buy[l+1]) ---
    bv = buy_vol.astype(jnp.float64)
    sv = sell_vol.astype(jnp.float64)
    pair_ok = lgrid + 1 < n_levels[:, None]                    # both levels exist
    sell_imb = jnp.zeros((n_bars, L), jnp.bool_)
    buy_imb = jnp.zeros((n_bars, L), jnp.bool_)
    sell_cmp = sv[:, :-1] > bv[:, 1:] * imbalance_factor
    buy_cmp = bv[:, 1:] > sv[:, :-1] * imbalance_factor
    sell_imb = sell_imb.at[:, :-1].set(sell_cmp & pair_ok[:, :-1])
    buy_imb = buy_imb.at[:, 1:].set(buy_cmp & pair_ok[:, :-1])

    # --- longest signed imbalance run (scan over levels, vmapped bars) ---
    sign = jnp.where(buy_imb, 1, jnp.where(sell_imb, -1, 0)).astype(jnp.int32)
    sign = jnp.where(lmask, sign, 0)

    def run_step(carry, s):
        run, run_sign, max_run, max_sign = carry
        cont = (s != 0) & (s == run_sign)
        new_run = jnp.where(cont, run + 1, jnp.where(s != 0, 1, 0))
        new_sign = jnp.where(s != 0, s, 0)
        better = new_run > max_run
        return (new_run, new_sign,
                jnp.where(better, new_run, max_run),
                jnp.where(better, new_sign, max_sign)), None

    zeros = jnp.zeros((n_bars,), jnp.int32)
    (_, _, max_run, max_sign), _ = jax.lax.scan(
        run_step, (zeros, zeros, zeros, zeros), sign.T)
    imb_max_run_signed = (max_run * max_sign).astype(jnp.int16)

    # --- COT & volume-profile stats ---
    total = jnp.where(lmask, bv + sv, 0.0)
    cot_idx = jnp.argmax(total, axis=1).astype(jnp.int32)
    cot_price_levels = low + cot_idx

    levels = low[:, None] + lgrid                              # integer price levels
    sum_total = jnp.sum(total, axis=1)
    safe = jnp.where(sum_total > 0, sum_total, 1.0)
    vwap = jnp.sum(levels * total, axis=1) / safe
    vp_skew = jnp.where(
        sum_total > 0,
        jnp.sum((levels - vwap[:, None]) * total, axis=1) / safe, 0.0)
    prop = total / safe[:, None]
    vp_gini = jnp.where(sum_total > 0, 1.0 - jnp.sum(prop * prop, axis=1), 0.0)

    return {
        "low_level": low,
        "n_levels": n_levels,
        "buy_volumes": buy_vol,
        "sell_volumes": sell_vol,
        "buy_ticks": buy_ticks,
        "sell_ticks": sell_ticks,
        "buy_imbalances": buy_imb,
        "sell_imbalances": sell_imb,
        "buy_imbalances_sum": jnp.sum(buy_imb, axis=1).astype(jnp.uint16),
        "sell_imbalances_sum": jnp.sum(sell_imb, axis=1).astype(jnp.uint16),
        "cot_price_levels": cot_price_levels,
        "imb_max_run_signed": imb_max_run_signed,
        "vp_skew": vp_skew,
        "vp_gini": vp_gini,
    }

"""Integer TPU fast path for dense footprint construction.

Same semantics as :mod:`finmlkit_tpu.bar.footprint` (the f64 path used on
CPU/tests) under the TPU rules of bar/aggregate_q.py: no f64 arithmetic,
no per-trade gathers (per-bar lows forward-filled by scatter deltas +
Pallas prefix sum), scatter-adds for the level grid, and the
longest-imbalance-run computed with a vectorized last-change-position
trick instead of a scan.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_scan import fast_cumsum_cols


@partial(jax.jit, static_argnames=("n",))
def _fp_rows(ci, low_t, n: int):
    pos = ci[1:] + 1
    val = jnp.where(pos < n, 1, 0).astype(jnp.int32)
    marks = jnp.zeros((n,), jnp.int32).at[jnp.clip(pos, 0, n - 1)].add(val)
    starts = jnp.clip(ci[:-1] + 1, 0, n - 1)
    deltas = jnp.diff(jnp.concatenate([jnp.zeros((1,), jnp.int32), low_t]))
    low_row = jnp.zeros((n,), jnp.int32).at[starts].add(deltas)
    return jnp.stack([marks, low_row])


@partial(jax.jit, static_argnames=("max_levels",))
def _fp_post(price_ticks, amounts_f32, ci, sides, P, low_t, n_levels,
             imbalance_factor_f32, max_levels: int):
    n = price_ticks.shape[0]
    n_bars = ci.shape[0] - 1
    L = max_levels
    idx = jnp.arange(n, dtype=jnp.int64)
    bar_id = jnp.clip(P[0], 0, n_bars - 1).astype(jnp.int64)
    valid = (idx > ci[0]) & (idx <= ci[-1])
    low_fill = P[1]

    lvl = price_ticks - low_fill
    in_range = valid & (lvl >= 0) & (lvl < L) & (lvl < n_levels[bar_id])
    flat = jnp.where(in_range, bar_id * L + lvl.astype(jnp.int64), n_bars * L)

    is_buy = (sides == 1) & in_range
    is_sell = (sides == -1) & in_range

    def scat(x):
        return jax.ops.segment_sum(
            x, flat, num_segments=n_bars * L + 1)[:-1].reshape(n_bars, L)

    buy_vol = scat(jnp.where(is_buy, amounts_f32, 0.0))
    sell_vol = scat(jnp.where(is_sell, amounts_f32, 0.0))
    # XLA's scatter-add runs a ~12ns/update serial path, so the grid
    # build is scatter-count-bound: both tick counters ride ONE int32
    # scatter as a 16-bit-packed pair (cells hold < 2^15 trades by the
    # max_levels/bar-size contract; exact)
    packed = scat(is_buy.astype(jnp.int32)
                  + (is_sell.astype(jnp.int32) << 16))
    buy_ticks = packed & 0xFFFF
    sell_ticks = packed >> 16

    lgrid = jnp.arange(L, dtype=jnp.int32)[None, :]
    lmask = lgrid < n_levels[:, None]
    pair_ok = lgrid + 1 < n_levels[:, None]

    f = imbalance_factor_f32
    sell_imb = jnp.zeros((n_bars, L), jnp.bool_)
    buy_imb = jnp.zeros((n_bars, L), jnp.bool_)
    sell_cmp = sell_vol[:, :-1] > buy_vol[:, 1:] * f
    buy_cmp = buy_vol[:, 1:] > sell_vol[:, :-1] * f
    sell_imb = sell_imb.at[:, :-1].set(sell_cmp & pair_ok[:, :-1])
    buy_imb = buy_imb.at[:, 1:].set(buy_cmp & pair_ok[:, :-1])

    # --- longest signed run via last-change positions (no scan) ---
    sign = jnp.where(buy_imb, 1, jnp.where(sell_imb, -1, 0)).astype(jnp.int32)
    sign = jnp.where(lmask, sign, 0)
    prev = jnp.concatenate([jnp.zeros((n_bars, 1), jnp.int32), sign[:, :-1]],
                           axis=1)
    # a run restarts where the sign differs from the previous level or is 0
    restart = (sign != prev) | (sign == 0)
    pos_grid = jnp.broadcast_to(lgrid, (n_bars, L))
    last_restart = jax.lax.cummax(jnp.where(restart, pos_grid, -1), axis=1)
    run = jnp.where(sign != 0, pos_grid - last_restart + 1, 0)
    # first occurrence of the max run (reference keeps the first max)
    max_run = jnp.max(run, axis=1)
    first_max = jnp.argmax(run, axis=1)
    max_sign = jnp.take_along_axis(sign, first_max[:, None], axis=1)[:, 0]
    imb_max_run_signed = (max_run * jnp.where(max_run > 0, max_sign, 0)) \
        .astype(jnp.int16)

    # --- COT & VP stats (f32) ---
    total = jnp.where(lmask, buy_vol + sell_vol, 0.0)
    cot_idx = jnp.argmax(total, axis=1).astype(jnp.int32)
    cot_price_levels = low_t + cot_idx
    levels = low_t[:, None] + lgrid
    sum_total = jnp.sum(total, axis=1)
    safe = jnp.where(sum_total > 0, sum_total, 1.0)
    # center levels for f32 accuracy (levels ~1e9 would swamp f32)
    lev_c = (levels - low_t[:, None]).astype(jnp.float32)
    vwap_c = jnp.sum(lev_c * total, axis=1) / safe
    vp_skew = jnp.where(sum_total > 0,
                        jnp.sum((lev_c - vwap_c[:, None]) * total, axis=1) / safe,
                        0.0)
    prop = total / safe[:, None]
    vp_gini = jnp.where(sum_total > 0, 1.0 - jnp.sum(prop * prop, axis=1), 0.0)

    return {
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


def comp_bar_footprints_q(price_ticks, amounts_f32, ci, sides,
                          low_t, high_t, imbalance_factor, *, max_levels: int):
    """Dense footprints from integer tick data (device pipeline).

    :param low_t/high_t: per-bar integer tick extrema (from the integer
        OHLCV pass). All arithmetic is int32/f32.
    """
    n = int(price_ticks.shape[0])
    n_levels = high_t - low_t + 1
    rows = _fp_rows(ci, low_t, n=n)
    P = fast_cumsum_cols(rows)
    out = _fp_post(price_ticks, amounts_f32, ci, sides, P, low_t,
                   n_levels, jnp.float32(imbalance_factor),
                   max_levels=max_levels)
    out = dict(out)
    out["low_level"] = np.asarray(low_t)
    out["n_levels"] = np.asarray(n_levels)
    return out

"""Time-sharded bar construction with explicit carry exchange.

TPU-native analog of the reference's process-level parallelism
(SURVEY.md §2.8). The trade axis is sharded over a 1-D mesh; bar close
indices (small, replicated) define global segments that straddle shard
boundaries. Each shard reduces its local trades into *global* per-bar
partials, then:

- sums combine with ``psum`` over the mesh axis,
- extrema combine with all_gather + axiswise max/min (pmax/pmin are
  avoided: some TPU AOT compilers lower only Sum all-reduces),
- the within-bar running-imbalance extrema need each shard's *global*
  prefix sums, so shards exchange their local totals (all_gather over
  ICI) and add the exclusive prefix of preceding shards — exactly the
  boundary carry state described in SURVEY.md §7,
- open/close prices are owned by exactly one shard and combine with
  ``psum`` of a one-hot contribution.

Events (triple-barrier labeling) shard trivially over the event axis
with replicated trades.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_trades(arrays: dict, mesh: Mesh, axis_name: str = "t") -> dict:
    """Pad trade arrays to a multiple of the mesh size and place them
    sharded along the time axis. Edge padding preserves sortedness;
    amounts pad with zero so padded trades never contribute."""
    n_shards = mesh.shape[axis_name]
    out = {}
    for name, arr in arrays.items():
        arr = np.asarray(arr)
        n = arr.shape[0]
        pad = (-n) % n_shards
        if pad:
            fill = np.zeros(pad, arr.dtype) if name == "amount" \
                else np.repeat(arr[-1:], pad, axis=0)
            arr = np.concatenate([arr, fill])
        out[name] = jax.device_put(arr, NamedSharding(mesh, P(axis_name)))
    return out


def _bar_partials(px, amt, side, ci, axis_name):
    """Per-shard global-bar partial reductions (runs inside shard_map)."""
    local_n = px.shape[0]
    n_bars = ci.shape[0] - 1
    me = jax.lax.axis_index(axis_name)
    offset = (me * local_n).astype(jnp.int64)
    gidx = offset + jnp.arange(local_n, dtype=jnp.int64)

    bar_id = jnp.clip(jnp.searchsorted(ci[1:], gidx, side="left"), 0, n_bars - 1)
    valid = (gidx > ci[0]) & (gidx <= ci[-1])

    def seg_sum(x):
        local = jax.ops.segment_sum(jnp.where(valid, x, 0.0), bar_id,
                                    num_segments=n_bars, indices_are_sorted=True)
        return jax.lax.psum(local, axis_name)

    # extrema combine via all_gather + axiswise max/min rather than
    # pmax/pmin: some TPU AOT compilers lower only Sum all-reduces, and
    # the gathered (n_shards, n_bars) intermediate is small.
    def seg_max(x, fill):
        local = jax.ops.segment_max(jnp.where(valid, x, fill), bar_id,
                                    num_segments=n_bars, indices_are_sorted=True)
        return jax.lax.all_gather(local, axis_name).max(axis=0)

    def seg_min(x, fill):
        local = jax.ops.segment_min(jnp.where(valid, x, fill), bar_id,
                                    num_segments=n_bars, indices_are_sorted=True)
        return jax.lax.all_gather(local, axis_name).min(axis=0)

    def owned_gather(pos):
        """Value of px at global positions `pos` (one owner shard each)."""
        lp = pos - offset
        mine = (lp >= 0) & (lp < local_n)
        vals = jnp.where(mine, px[jnp.clip(lp, 0, local_n - 1)], 0.0)
        return jax.lax.psum(vals, axis_name)

    amt64 = amt.astype(jnp.float64)
    s = side.astype(jnp.float64)
    is_buy = (s == 1).astype(jnp.float64)
    is_sell = (s == -1).astype(jnp.float64)
    dollars = px * amt64

    counts = jnp.diff(ci)
    empty = counts == 0
    close_p = owned_gather(ci[1:])
    open_p = owned_gather(jnp.minimum(ci[:-1] + 1, ci[-1]))
    open_p = jnp.where(empty, close_p, open_p)

    vol = seg_sum(amt64)
    dol = seg_sum(dollars)
    high = jnp.where(empty, close_p, seg_max(px, -jnp.inf))
    low = jnp.where(empty, close_p, seg_min(px, jnp.inf))
    vwap = jnp.where(vol > 0, dol / jnp.where(vol > 0, vol, 1.0), 0.0)

    # --- directional sums ---
    ticks_buy = seg_sum(is_buy).astype(jnp.int64)
    ticks_sell = seg_sum(is_sell).astype(jnp.int64)
    volume_buy = seg_sum(is_buy * amt64)
    volume_sell = seg_sum(is_sell * amt64)
    dollars_buy = seg_sum(is_buy * dollars)
    dollars_sell = seg_sum(is_sell * dollars)

    # --- within-bar running cum extrema with cross-shard carry ---
    def cum_extrema(contrib):
        contrib = jnp.where(valid, contrib, 0.0)
        local_prefix = jnp.cumsum(contrib)          # inclusive, local
        total = local_prefix[-1]
        all_totals = jax.lax.all_gather(total, axis_name)  # (n_shards,)
        carry = jnp.sum(jnp.where(jnp.arange(all_totals.shape[0]) < me,
                                  all_totals, 0.0))
        gprefix = local_prefix + carry              # global inclusive prefix
        # base per bar: global prefix at index ci[i] (owned by one shard)
        pos = ci[:-1]
        lp = pos - offset
        mine = (lp >= 0) & (lp < local_n)
        base_vals = jnp.where(mine, gprefix[jnp.clip(lp, 0, local_n - 1)], 0.0)
        # bars whose anchor precedes all trades (ci = -1) have base 0
        base = jax.lax.psum(jnp.where(pos >= 0, base_vals, 0.0), axis_name)
        local_cum = gprefix - base[bar_id]
        m = valid & (s != 0)
        mx = jax.lax.all_gather(jax.ops.segment_max(
            jnp.where(m, local_cum, -jnp.inf), bar_id, num_segments=n_bars,
            indices_are_sorted=True), axis_name).max(axis=0)
        mn = jax.lax.all_gather(jax.ops.segment_min(
            jnp.where(m, local_cum, jnp.inf), bar_id, num_segments=n_bars,
            indices_are_sorted=True), axis_name).min(axis=0)
        return jnp.minimum(mn, 1e9), jnp.maximum(mx, -1e9)

    ct_min, ct_max = cum_extrema(s)
    cv_min, cv_max = cum_extrema(s * amt64)
    cd_min, cd_max = cum_extrema(s * dollars)

    return {
        "open": open_p, "high": high, "low": low, "close": close_p,
        "volume": jnp.where(empty, 0.0, vol).astype(jnp.float32),
        "vwap": jnp.where(empty, 0.0, vwap), "trades": counts,
        "ticks_buy": ticks_buy, "ticks_sell": ticks_sell,
        "volume_buy": volume_buy.astype(jnp.float32),
        "volume_sell": volume_sell.astype(jnp.float32),
        "dollars_buy": dollars_buy.astype(jnp.float32),
        "dollars_sell": dollars_sell.astype(jnp.float32),
        "cum_ticks_min": ct_min.astype(jnp.int64),
        "cum_ticks_max": ct_max.astype(jnp.int64),
        "cum_volume_min": cv_min.astype(jnp.float32),
        "cum_volume_max": cv_max.astype(jnp.float32),
        "cum_dollars_min": cd_min.astype(jnp.float32),
        "cum_dollars_max": cd_max.astype(jnp.float32),
    }


def sharded_bar_products(trades: dict, ci, mesh: Mesh, axis_name: str = "t"):
    """OHLCV + directional products computed across the mesh.

    :param trades: dict with sharded 'price' (f64), 'amount' (f32),
        'side' (i8) arrays (see :func:`shard_trades`).
    :param ci: replicated close indices (n_bars+1,).
    :returns: dict of replicated per-bar arrays.
    """
    fn = shard_map(
        partial(_bar_partials, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(None)),
        out_specs=P(None),
        check_vma=False,
    )
    ci = jnp.asarray(ci, jnp.int64)
    return jax.jit(fn)(trades["price"], trades["amount"], trades["side"], ci)

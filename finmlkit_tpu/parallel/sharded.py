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
    # all per-element index arithmetic happens in the LOCAL domain: the
    # shard offset shifts the (n_bars,)-sized ci instead of an
    # O(local_n) `offset + iota` plane (device-work overhead, SCALING)
    lidx = jnp.arange(local_n, dtype=jnp.int64)
    ci_l = ci - offset

    bar_id = jnp.clip(jnp.searchsorted(ci_l[1:], lidx, side="left"),
                      0, n_bars - 1)
    valid = (lidx > ci_l[0]) & (lidx <= ci_l[-1])

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
        # base per bar: global prefix at index ci[i] (owned by one shard).
        # The shard carry folds into the (n_bars,)-sized base instead of
        # a per-element `local_prefix + carry` plane: local - (base -
        # carry) == (local + carry) - base, one O(n_bars) subtraction
        # instead of an O(local_n) add (SCALING device-work overhead).
        pos = ci[:-1]
        lp = pos - offset
        mine = (lp >= 0) & (lp < local_n)
        base_vals = jnp.where(
            mine, local_prefix[jnp.clip(lp, 0, local_n - 1)] + carry, 0.0)
        # bars whose anchor precedes all trades (ci = -1) have base 0
        base = jax.lax.psum(jnp.where(pos >= 0, base_vals, 0.0), axis_name)
        local_cum = local_prefix - (base - carry)[bar_id]
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


# ---------------------------------------------------------------------------
# Distributed per-bar order statistics (median / quantiles across shards)
# ---------------------------------------------------------------------------

def _kth_partials(vals, ci, ks, axis_name):
    """k-th smallest trade amount per bar, across shards, via radix select.

    TPU-native distributed order statistics: no global sort, no gather of
    the trade axis. Each shard sorts only its *local* ``(bar_id, value)``
    keys (one int64 sort, the same packing as
    :func:`finmlkit_tpu.ops.segment.sorted_segments`). The k-th value is
    then resolved bit-by-bit over the 32 order-preserving float bits: per
    bit, a replicated per-bar candidate is counted locally (searchsorted
    into the local sorted keys) and the counts combine with ``psum`` over
    ICI — 32 rounds of an (n_q, n_bars) all-reduce, O(local) memory.

    Greedy MSB-first construction of the largest value ``v`` with
    ``count(< v) <= k`` is exact because the predicate is downward-closed
    in ``v``; that maximum *is* the k-th (0-indexed) order statistic.

    :param vals: local f32 value shard.
    :param ci: replicated close indices (n_bars+1,).
    :param ks: replicated (n_q, n_bars) int64 ranks, 0-indexed within bar.
    :returns: (n_q, n_bars) f32 values (garbage for empty bars — mask).
    """
    from ..ops.segment import _f32_sortable_bits, _f32_from_sortable_bits

    local_n = vals.shape[0]
    n_bars = ci.shape[0] - 1
    me = jax.lax.axis_index(axis_name)
    offset = (me * local_n).astype(jnp.int64)
    gidx = offset + jnp.arange(local_n, dtype=jnp.int64)
    bar_id = jnp.clip(jnp.searchsorted(ci[1:], gidx, side="left"), 0, n_bars - 1)
    valid = (gidx > ci[0]) & (gidx <= ci[-1])

    bits = _f32_sortable_bits(vals.astype(jnp.float32)).astype(jnp.uint64)
    bid = jnp.where(valid, bar_id, n_bars).astype(jnp.uint64)
    skey = jnp.sort(((bid << 32) | bits).astype(jnp.int64))

    bars = jnp.arange(n_bars, dtype=jnp.int64)
    base = jnp.searchsorted(skey, bars << 32, side="left")  # local rank of bar start

    def bit_step(i, v):
        b = (31 - i).astype(jnp.uint32)
        cand = v | (jnp.uint32(1) << b)
        keyc = (bars[None, :] << 32) | cand.astype(jnp.int64)
        lc = jnp.searchsorted(skey, keyc.reshape(-1), side="left")
        lc = lc.reshape(cand.shape) - base[None, :]
        tot = jax.lax.psum(lc, axis_name)
        return jnp.where(tot <= ks, cand, v)

    v = jax.lax.fori_loop(0, 32, bit_step, jnp.zeros(ks.shape, jnp.uint32))
    return _f32_from_sortable_bits(v)


def sharded_segment_kth(values, ci, ks, mesh: Mesh, axis_name: str = "t"):
    """k-th order statistic per bar over sharded values (see _kth_partials)."""
    fn = shard_map(
        partial(_kth_partials, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P(None), P(None)),
        out_specs=P(None),
        check_vma=False,
    )
    return jax.jit(fn)(values, jnp.asarray(ci, jnp.int64),
                       jnp.asarray(ks, jnp.int64))


def sharded_median_trade_size(trades: dict, ci, mesh: Mesh, axis_name: str = "t"):
    """Per-bar median trade size across the mesh (numpy median semantics:
    mean of the two middle values). Matches the single-chip
    ``comp_bar_ohlcv['median_trade_size']`` (empty bars → 0.0). The final
    f64 average happens host-side, like the single-chip TPU path."""
    ci_np = np.asarray(ci, np.int64)
    counts = np.diff(ci_np)
    k_lo = np.maximum(counts - 1, 0) >> 1
    k_hi = np.maximum(counts, 1) >> 1
    vals = np.asarray(sharded_segment_kth(
        trades["amount"], ci_np, np.stack([k_lo, k_hi]), mesh, axis_name))
    med = (vals[0].astype(np.float64) + vals[1].astype(np.float64)) * 0.5
    return np.where(counts == 0, 0.0, med)


def _size_sum_partials(amt, ci, thr, axis_name):
    """Per-shard partials for trade-size features (sums combine via psum)."""
    local_n = amt.shape[0]
    n_bars = ci.shape[0] - 1
    me = jax.lax.axis_index(axis_name)
    gidx = (me * local_n).astype(jnp.int64) + jnp.arange(local_n, dtype=jnp.int64)
    bar_id = jnp.clip(jnp.searchsorted(ci[1:], gidx, side="left"), 0, n_bars - 1)
    valid = (gidx > ci[0]) & (gidx <= ci[-1])

    a = jnp.where(valid, amt.astype(jnp.float64), 0.0)

    def seg_sum(x):
        local = jax.ops.segment_sum(x, bar_id, num_segments=n_bars,
                                    indices_are_sorted=True)
        return jax.lax.psum(local, axis_name)

    total = seg_sum(a)
    sumsq = seg_sum(a * a)
    block = seg_sum(jnp.where(a > thr[bar_id], a, 0.0))
    return total, sumsq, block


def sharded_trade_size_features(trades: dict, ci, theta, mesh: Mesh,
                                theta_mult: float = 5.0, axis_name: str = "t"):
    """Trade-size features across the mesh; parity with the single-chip
    ``comp_bar_trade_size_features`` (reference semantics at
    /root/reference/finmlkit/bar/base.py:549-612): log1p-scaled mean and
    p95 vs theta, block-volume percentage, size Gini, with the same NaN
    rules. Sums combine with psum; the p95 order statistics come from the
    distributed radix select; f64 assembly is host-side numpy."""
    ci_np = np.asarray(ci, np.int64)
    counts = np.diff(ci_np)
    empty = counts == 0
    theta = np.asarray(theta, np.float64)
    thr = theta * theta_mult

    fn = shard_map(
        partial(_size_sum_partials, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P(None), P(None)),
        out_specs=P(None),
        check_vma=False,
    )
    total, sumsq, block = jax.jit(fn)(
        trades["amount"], jnp.asarray(ci_np), jnp.asarray(thr))
    total = np.asarray(total); sumsq = np.asarray(sumsq); block = np.asarray(block)

    # p95 bracketing order statistics (numpy linear interpolation)
    cm1 = np.maximum(counts, 1) - 1
    k_lo = (cm1 * 95) // 100
    k_hi = np.minimum(k_lo + 1, cm1)
    vals = np.asarray(sharded_segment_kth(
        trades["amount"], ci_np, np.stack([k_lo, k_hi]), mesh, axis_name))
    pos = 0.95 * cm1.astype(np.float64)
    frac = pos - k_lo.astype(np.float64)
    p95 = vals[0].astype(np.float64) * (1.0 - frac) + vals[1].astype(np.float64) * frac

    mean = total / np.maximum(counts, 1).astype(np.float64)
    base_nan = empty | (theta == 0.0)
    safe_thr = np.where(thr > 0, thr, 1.0)
    mean_size_rel = np.where(base_nan, np.nan, np.log1p(mean / safe_thr))
    size_95_rel = np.where(base_nan, np.nan, np.log1p(p95 / safe_thr))

    vol_nan = base_nan | (total == 0.0)
    safe_total = np.where(total > 0, total, 1.0)
    pct_block = np.where(vol_nan, np.nan, block / safe_total)
    gini = np.where(vol_nan, np.nan, 1.0 - sumsq / (safe_total * safe_total))
    gini = np.where(vol_nan, np.nan, np.where(counts == 1, 0.0, gini))

    return {
        "mean_size_rel": mean_size_rel.astype(np.float32),
        "size_95_rel": size_95_rel.astype(np.float32),
        "pct_block": pct_block.astype(np.float32),
        "size_gini": gini.astype(np.float32),
    }

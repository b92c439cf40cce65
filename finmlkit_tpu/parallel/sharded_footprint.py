"""Sharded footprints and rolling volume profile on the time mesh.

Distributes the flagship intra-bar features (reference:
comp_bar_footprints at /root/reference/finmlkit/bar/base.py:615-752 and
volume_profile_rolling at feature/core/volume.py:393-456) per
SURVEY.md §7:

- **footprint tensors** — each shard scatter-adds its local trades into
  a partial dense ``(n_bars, L)`` tensor; partials combine with one
  ``psum`` over the mesh (volumes and tick counts are sums, so the
  dense tensor is the natural carry). Per-bar features then run on the
  replicated tensors via the exact single-device code path
  (bar.footprint.footprint_features_from_tensors).
- **rolling volume profile** — the *bar* axis is sharded; each device
  computes the trailing-window profile for its bar slice. The lookback
  needs up to ``max_window_bars`` preceding bars, fetched as a halo
  with a chain of ``ppermute`` steps (one per preceding shard the
  window can reach into) — memory per device is
  O(local_bars + halo), never the full bar axis.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bar.footprint import footprint_features_from_tensors
from ..feature.kernels.volume import _poc_hva_lva_single, _bucket_profile

__all__ = ["sharded_bar_footprints", "sharded_volume_profile_rolling"]


def _footprint_partials(ticks, amounts, sides, ci, low, n_levels,
                        *, L, n, local_n, axis_name):
    """Per-shard partial footprint tensors (runs inside shard_map)."""
    n_bars = ci.shape[0] - 1
    me = lax.axis_index(axis_name)
    gidx = me.astype(jnp.int64) * local_n + jnp.arange(local_n, dtype=jnp.int64)
    valid = (gidx > ci[0]) & (gidx <= ci[-1]) & (gidx < n)
    bar_id = jnp.clip(jnp.searchsorted(ci[1:], gidx, side="left"),
                      0, n_bars - 1)

    lvl = ticks - low[bar_id]
    in_range = valid & (lvl >= 0) & (lvl < n_levels[bar_id])
    flat = jnp.where(in_range, bar_id.astype(jnp.int64) * L + lvl,
                     n_bars * L)
    is_buy = (sides == 1) & in_range
    is_sell = (sides == -1) & in_range
    amt = amounts.astype(jnp.float64)

    def scat(x):
        local = jax.ops.segment_sum(
            x, flat, num_segments=n_bars * L + 1)[:-1].reshape(n_bars, L)
        return lax.psum(local, axis_name)

    buy_vol = scat(jnp.where(is_buy, amt, 0.0)).astype(jnp.float32)
    sell_vol = scat(jnp.where(is_sell, amt, 0.0)).astype(jnp.float32)
    buy_ticks = scat(is_buy.astype(jnp.int64)).astype(jnp.int32)
    sell_ticks = scat(is_sell.astype(jnp.int64)).astype(jnp.int32)
    return buy_vol, sell_vol, buy_ticks, sell_ticks


def sharded_bar_footprints(trades: dict, ci, bar_lows, bar_highs,
                           price_tick_size: float, imbalance_factor: float,
                           mesh: Mesh, axis_name: str = "t",
                           max_levels: int | None = None, n: int | None = None):
    """Dense footprint tensors + features computed across the mesh.

    :param trades: dict with time-sharded 'price' (f64), 'amount' (f32),
        'side' (i8) arrays (from shard_trades / load_store_to_mesh).
    :param ci: replicated close indices (n_bars+1,).
    :param bar_lows/bar_highs: per-bar price extrema (host or replicated).
    :param n: real trade count (default: the padded sharded length).
    :returns: dict of replicated tensors/features, identical to
        bar.footprint.comp_bar_footprints.
    """
    px = trades["price"]
    n_pad = px.shape[0]
    n = n_pad if n is None else int(n)
    n_shards = mesh.shape[axis_name]
    local_n = n_pad // n_shards

    low = jnp.round(jnp.asarray(bar_lows) / price_tick_size).astype(jnp.int32)
    high = jnp.round(jnp.asarray(bar_highs) / price_tick_size).astype(jnp.int32)
    n_levels = high - low + 1
    if max_levels is None:
        max_levels = int(np.asarray(jnp.max(n_levels)))
    ticks = jnp.round(px / price_tick_size).astype(jnp.int32)

    fn = shard_map(
        partial(_footprint_partials, L=max_levels, n=n, local_n=local_n,
                axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(None),
                  P(None), P(None)),
        out_specs=(P(None),) * 4,
        check_vma=False)
    buy_vol, sell_vol, buy_ticks, sell_ticks = jax.jit(fn)(
        ticks, trades["amount"], trades["side"], jnp.asarray(ci, jnp.int64),
        low, n_levels)
    return footprint_features_from_tensors(
        low, n_levels, buy_vol, sell_vol, buy_ticks, sell_ticks,
        imbalance_factor)


# ---------------------------------------------------------------------------
# Rolling volume profile over a sharded bar axis with halo exchange
# ---------------------------------------------------------------------------

def _halo_concat(x_local, halo_steps: int, axis_name: str, n_shards: int):
    """Prepend the previous ``halo_steps`` shards' slabs via a ppermute
    chain; out-of-stream rows (before shard 0) arrive zero-filled."""
    me = lax.axis_index(axis_name)
    slabs = []
    for s in range(halo_steps, 0, -1):
        perm = [(k, k + s) for k in range(n_shards - s)]
        shifted = lax.ppermute(x_local, axis_name, perm)
        shifted = jnp.where((me >= s).reshape((1,) * x_local.ndim),
                            shifted, jnp.zeros_like(shifted))
        slabs.append(shifted)
    slabs.append(x_local)
    return jnp.concatenate(slabs, axis=0)


def _profile_local(ts, lo, nl, total, *, n_shards, local_b, halo_steps,
                   window_ns, va_pct, max_levels, n_bins, W, axis_name):
    """Windowed POC/HVA/LVA for this shard's bars (inside shard_map)."""
    me = lax.axis_index(axis_name)
    off = me.astype(jnp.int64) * local_b

    ts_s = _halo_concat(ts, halo_steps, axis_name, n_shards)
    lo_s = _halo_concat(lo, halo_steps, axis_name, n_shards)
    nl_s = _halo_concat(nl, halo_steps, axis_name, n_shards)
    tv_s = _halo_concat(total, halo_steps, axis_name, n_shards)
    h0 = halo_steps * local_b  # local bar j sits at slab row h0 + j
    S = ts_s.shape[0]
    L = total.shape[1]

    # halo rows before the stream start carry ts=0: give them -inf-like
    # timestamps so searchsorted never selects them
    slab_gidx = off - h0 + jnp.arange(S, dtype=jnp.int64)
    ts_s = jnp.where(slab_gidx >= 0, ts_s, jnp.int64(-(1 << 62)))

    start_idx = jnp.searchsorted(ts_s, ts_s - window_ns, side="left")

    def one_bar(j):
        i = h0 + j
        s = start_idx[i]
        base = jnp.clip(i - W + 1, 0, jnp.maximum(S - W, 0))
        rows = jnp.arange(W) + base
        in_win = (rows >= s) & (rows <= i) & (rows + (off - h0) >= 0)
        lo_w = lax.dynamic_slice(lo_s, (base,), (W,))
        nl_w = lax.dynamic_slice(nl_s, (base,), (W,))
        vol_w = lax.dynamic_slice(tv_s, (base, 0), (W, L))
        lo_min = jnp.min(jnp.where(in_win, lo_w, jnp.iinfo(jnp.int32).max))
        offs = lo_w - lo_min
        cols = jnp.arange(L)
        tgt = jnp.clip(offs[:, None] + cols[None, :], 0, max_levels - 1)
        w = jnp.where(in_win[:, None] & (cols[None, :] < nl_w[:, None]),
                      vol_w, 0.0)
        grid = jax.ops.segment_sum(w.reshape(-1), tgt.reshape(-1),
                                   num_segments=max_levels)
        levels = lo_min + jnp.arange(max_levels, dtype=jnp.int32)
        if n_bins is not None:
            levels, grid = _bucket_profile(levels, grid, n_bins)
        return _poc_hva_lva_single(levels, grid, va_pct)

    poc, hva, lva, pct = lax.map(one_bar, jnp.arange(local_b),
                                 batch_size=64)
    return poc.astype(jnp.int32), hva.astype(jnp.int32), \
        lva.astype(jnp.int32), pct.astype(jnp.float32)


def sharded_volume_profile_rolling(ts, low_level, n_levels, buy_dense,
                                   sell_dense, window_size_sec, mesh: Mesh,
                                   axis_name: str = "t", n_bins=None,
                                   va_pct: float = 68.34,
                                   max_levels: int | None = None):
    """Rolling POC/HVA/LVA/pct-above-POC with the bar axis sharded.

    Host arrays in, host arrays out; parity with
    feature.kernels.volume.volume_profile_rolling. The trailing time
    window reaches at most ``max_window_bars`` bars back (measured on
    the host), which fixes the halo depth in shards.
    """
    ts = np.asarray(ts, np.int64)
    lo = np.asarray(low_level, np.int32)
    nl = np.asarray(n_levels, np.int32)
    total = (np.asarray(buy_dense, np.float64)
             + np.asarray(sell_dense, np.float64))
    n_bars, L = total.shape
    window_ns = int(window_size_sec * 1e9)

    start_h = np.searchsorted(ts, ts - window_ns, side="left")
    W = int((np.arange(n_bars) - start_h + 1).max())
    if max_levels is None:
        from scipy.ndimage import maximum_filter1d, minimum_filter1d
        hi_h = lo + nl
        orig = -((W - 1) // 2)
        hi_roll = maximum_filter1d(hi_h, size=W, mode="nearest", origin=orig)
        lo_roll = minimum_filter1d(lo, size=W, mode="nearest", origin=orig)
        max_levels = max(int((hi_roll - lo_roll).max()), L)

    n_shards = mesh.shape[axis_name]
    local_b = math.ceil(n_bars / n_shards)
    pad = local_b * n_shards - n_bars
    if pad:
        ts = np.concatenate([ts, np.repeat(ts[-1:], pad)])
        lo = np.concatenate([lo, np.repeat(lo[-1:], pad)])
        nl = np.concatenate([nl, np.zeros(pad, nl.dtype)])
        total = np.concatenate([total, np.zeros((pad, L))])
    halo_steps = min(math.ceil(max(W - 1, 0) / local_b), n_shards - 1)

    sh = NamedSharding(mesh, P(axis_name))
    sh2 = NamedSharding(mesh, P(axis_name, None))
    fn = shard_map(
        partial(_profile_local, n_shards=n_shards, local_b=local_b,
                halo_steps=halo_steps, window_ns=jnp.int64(window_ns),
                va_pct=jnp.float64(va_pct), max_levels=int(max_levels),
                n_bins=int(n_bins) if n_bins is not None else None,
                W=W, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name, None)),
        out_specs=(P(axis_name),) * 4,
        check_vma=False)
    poc, hva, lva, pct = jax.jit(fn)(
        jax.device_put(ts, sh), jax.device_put(lo, sh),
        jax.device_put(nl, sh), jax.device_put(total, sh2))

    poc, hva, lva, pct = (np.asarray(poc)[:n_bars], np.asarray(hva)[:n_bars],
                          np.asarray(lva)[:n_bars], np.asarray(pct)[:n_bars])
    # reference warm-up rule: zero before the first full window
    first = int(np.searchsorted(ts[:n_bars], ts[0] + window_ns))
    idxs = np.arange(n_bars)
    ok = idxs >= first
    return (np.where(ok, poc, 0).astype(np.int32),
            np.where(ok, hva, 0).astype(np.int32),
            np.where(ok, lva, 0).astype(np.int32),
            np.where(ok, pct, 0.0).astype(np.float32))

"""Sharded bar indexers: boundary discovery ON the device mesh.

This is the distributed core of SURVEY.md §7: the reference's sequential
bar-boundary scans (/root/reference/finmlkit/bar/logic.py:12-261) are
re-derived as mesh programs over a 1-D time shard, with exactly the
carry state the blueprint names exchanged at shard boundaries:

- **time bars** — per-shard clock binning + ``psum`` of bin counts; no
  carry (boundaries are data-independent).
- **tick bars** — closed form from the global count; no mesh needed.
- **dollar bars** (carry remainder) — the global dollar cumsum is
  monotone, so each shard owns the crossings that land in its range:
  local cumsum + exclusive shard-prefix carry (``all_gather`` of shard
  totals), a per-target local searchsorted, and a replicated cummax
  bump. Fully parallel: the carry is one partial sum per shard.
- **volume bars** (reset to zero), **CUSUM bars** (s+/s- state),
  **imbalance/run bars** (EMA expectations + in-bar cums) — true
  sequential dependencies where only an O(1) carry crosses the
  boundary: a *ring pipeline* walks the shards in time order, each step
  running the shard-local event-jump scan (the same code path as the
  single-device indexers in bar/indexers.py) and handing the carry to
  the next shard with a masked ``psum`` broadcast. Wall-clock equals
  the inherent sequential chain over n_shards local scans while the
  trade arrays stay sharded (O(n/n_shards) memory per device).

Exactness: integer-quantized volume/dollar paths are bit-exact vs the
single-device indexers (integer addition is associative). Float paths
re-associate f64 sums at shard boundaries, so a boundary may shift only
when a threshold comparison lands within one ulp of the carry — the
parity tests use dyadic-rational volumes (exact f64 sums) to pin
bit-exactness, and random-data tests confirm it in practice.

All functions accept host numpy columns, place them on the mesh
internally, and return host ``(close_ts, ci)`` in the reference
convention (element 0 = open anchor).
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bar.indexers import (_cusum_boundaries, _info_bar_boundaries,
                            _volume_boundaries, _CUSUM_CHUNK, _IMB_CHUNK,
                            _DOLLAR_SHIFT)

__all__ = [
    "sharded_time_bar_indexer", "sharded_tick_bar_indexer",
    "sharded_volume_bar_indexer", "sharded_dollar_bar_indexer",
    "sharded_cusum_bar_indexer", "sharded_imbalance_bar_indexer",
    "sharded_run_bar_indexer",
]


def _place(arr: np.ndarray, mesh: Mesh, axis_name: str, fill="edge"):
    """Pad to a shard multiple and place sharded along the time axis."""
    n_shards = mesh.shape[axis_name]
    arr = np.asarray(arr)
    pad = (-arr.shape[0]) % n_shards
    if pad:
        tail = np.zeros(pad, arr.dtype) if fill == "zero" \
            else np.repeat(arr[-1:], pad, axis=0)
        arr = np.concatenate([arr, tail])
    return jax.device_put(arr, NamedSharding(mesh, P(axis_name)))


def _ring(local_fn, carry0, n_shards: int, axis_name: str, out_slots: int,
          extra_outs=()):
    """Sequential ring over shards inside one mesh program.

    ``local_fn(carry) -> (out_idx, count, new_carry)`` runs the
    shard-local boundary scan; step ``k`` keeps device k's result and
    broadcasts its carry with a masked psum (the explicit carry
    exchange). Returns per-device ``(out_idx, count, final_carry)``.
    """
    me = lax.axis_index(axis_name)

    def step(k, st):
        carry, out, cnt = st
        new_out, new_cnt, new_carry = local_fn(carry)
        keep = me == k
        out = jnp.where(keep, new_out, out)
        cnt = jnp.where(keep, new_cnt, cnt)
        carry = jax.tree.map(
            lambda nc, oc: lax.psum(
                jnp.where(keep, nc, jnp.zeros_like(nc)), axis_name),
            new_carry, carry)
        return carry, out, cnt

    out0 = jnp.zeros((out_slots,), jnp.int64)
    carry, out, cnt = lax.fori_loop(
        0, n_shards, step, (carry0, out0, jnp.zeros((), jnp.int64)))
    return out, cnt, carry


def _assemble(out_stacked, counts, slots: int, anchor: int = 0):
    """Host: concatenate per-shard boundary slots in shard order."""
    out_stacked = np.asarray(out_stacked).reshape(-1, slots)
    counts = np.asarray(counts)
    parts = [np.asarray([anchor], np.int64)]
    for k in range(out_stacked.shape[0]):
        parts.append(out_stacked[k, : int(counts[k])])
    return np.concatenate(parts)


# ---------------------------------------------------------------------------
# Time bars (psum of clock-bin counts; no carry)
# ---------------------------------------------------------------------------

def sharded_time_bar_indexer(timestamps: np.ndarray, interval_seconds: float,
                             mesh: Mesh, axis_name: str = "t"):
    """Mesh time-bar indexer; bit-exact vs bar.indexers.time_bar_indexer.

    Each shard bins its local trades onto the replicated f64 bar clock
    (identical per-element math to the single-device `_time_bar_ci`) and
    the integer bin counts combine with one ``psum``.
    """
    import math

    timestamps = np.asarray(timestamps)
    n = timestamps.shape[0]
    step = float(interval_seconds) * 1e9
    start = math.floor(float(timestamps[0]) / step) * step
    last = math.ceil(float(timestamps[-1]) / step) * step
    n_clock = int(np.ceil((last + step + 1.0 - start) / step))
    clock = (start + np.arange(n_clock, dtype=np.float64) * step).astype(np.int64)
    step_i, start_i = int(step), int(start)
    inv_step = 1.0 / step
    if step != step_i:
        raise ValueError("sharded time indexer requires integer-ns intervals")

    ts_sh = _place(timestamps, mesh, axis_name)
    n_shards = mesh.shape[axis_name]
    local_n = ts_sh.shape[0] // n_shards

    def prog(ts_local):
        me = lax.axis_index(axis_name)
        gidx = me.astype(jnp.int64) * local_n + jnp.arange(local_n, dtype=jnp.int64)
        valid = gidx < n

        def clock_at(kk):
            prod = (kk * step_i).astype(jnp.float64)
            return (jnp.float64(start) + prod).astype(jnp.int64)

        rel = (ts_local - start_i).astype(jnp.float32)
        b = jnp.floor(rel * jnp.float32(inv_step)).astype(jnp.int64)
        resid = (ts_local - clock_at(b)).astype(jnp.float32)
        b = b + jnp.floor(resid * jnp.float32(inv_step)).astype(jnp.int64)
        b = jnp.where(ts_local <= clock_at(b), b - 1, b)
        b = jnp.where(ts_local > clock_at(b + 1), b + 1, b)
        cnt = jnp.zeros((n_clock + 1,), jnp.int64)
        cnt = cnt.at[jnp.clip(b + 1, 0, n_clock)].add(
            jnp.where(valid, 1, 0).astype(jnp.int64))
        cnt = lax.psum(cnt, axis_name)
        return jnp.cumsum(cnt)[:n_clock] - 1

    fn = shard_map(prog, mesh=mesh, in_specs=(P(axis_name),),
                   out_specs=P(None), check_vma=False)
    ci = np.asarray(jax.jit(fn)(ts_sh))
    return clock, ci


def sharded_tick_bar_indexer(timestamps: np.ndarray, threshold: int,
                             mesh: Optional[Mesh] = None, axis_name: str = "t"):
    """Tick bars are a closed-form arithmetic progression of the global
    count — data-independent, so the 'sharded' version is the closed
    form itself (every shard can emit its own slice locally)."""
    timestamps = np.asarray(timestamps)
    n = timestamps.shape[0]
    step = max(int(threshold), 1)
    first = max(int(threshold) - 1, 1)
    ci = np.concatenate([np.zeros(1, np.int64),
                         np.arange(first, n, step, dtype=np.int64)])
    return timestamps[ci], ci


# ---------------------------------------------------------------------------
# Dollar bars (monotone cumsum -> fully parallel crossing ownership)
# ---------------------------------------------------------------------------

def _dollar_prog(d_local, n, local_n, max_bars, thr, axis_name):
    me = lax.axis_index(axis_name)
    gidx = me.astype(jnp.int64) * local_n + jnp.arange(local_n, dtype=jnp.int64)
    valid = gidx < n
    d_local = jnp.where(valid, d_local, jnp.zeros_like(d_local))
    lc = jnp.cumsum(d_local)
    nv = jnp.clip(n - me.astype(jnp.int64) * local_n, 0, local_n)

    # exclusive shard-prefix carry of the cumsum (the dollar carry state)
    total = lc[-1]
    totals = lax.all_gather(total, axis_name)
    carry = jnp.sum(jnp.where(jnp.arange(totals.shape[0]) < me, totals,
                              jnp.zeros_like(totals)))

    m = jnp.arange(1, max_bars + 1, dtype=jnp.float64)
    targets = m * thr
    # global prefix values for this shard are lc + carry (exact for ints)
    p = jnp.searchsorted(lc + carry, targets, side="left").astype(jnp.int64)
    cand = jnp.where(p < nv, p + me.astype(jnp.int64) * local_n, n)
    naive = lax.all_gather(cand, axis_name).min(axis=0)
    naive = jnp.maximum(naive, 1)
    mi = jnp.arange(1, max_bars + 1, dtype=jnp.int64)
    b = mi + lax.cummax(naive - mi)
    count = jnp.sum(b <= n - 1)
    return b, count


def sharded_dollar_bar_indexer(timestamps, prices, volumes, threshold: float,
                               mesh: Mesh, axis_name: str = "t",
                               price_ticks=None, amount_units=None,
                               tick_size=None, amount_scale=None):
    """Mesh dollar-bar indexer (carry-remainder semantics).

    With quantized inputs (``price_ticks``/``amount_units``) the int64
    dollar-unit cumsum is exact and boundaries are bit-exact vs
    bar.indexers.dollar_bar_indexer_q; the f64 path re-associates sums
    at shard boundaries (see module docstring).
    """
    timestamps = np.asarray(timestamps)
    n = timestamps.shape[0]
    n_shards = mesh.shape[axis_name]
    if price_ticks is not None and amount_units is not None:
        d = (np.asarray(price_ticks).astype(np.int64)
             * np.asarray(amount_units).astype(np.int64)) >> _DOLLAR_SHIFT
        thr = float(threshold) / (tick_size * amount_scale) / (1 << _DOLLAR_SHIFT)
    else:
        d = np.asarray(prices, np.float64) * np.asarray(volumes, np.float64)
        thr = float(threshold)
    total = float(d.sum())
    max_bars = min(max(int(total / thr) + 1, 1), n)
    d_sh = _place(d, mesh, axis_name, fill="zero")
    local_n = d_sh.shape[0] // n_shards

    fn = shard_map(
        partial(_dollar_prog, n=n, local_n=local_n, max_bars=max_bars,
                thr=thr, axis_name=axis_name),
        mesh=mesh, in_specs=(P(axis_name),), out_specs=(P(None), P()),
        check_vma=False)
    b, count = jax.jit(fn)(d_sh)
    count = int(count)
    ci = np.concatenate([np.zeros(1, np.int64), np.asarray(b)[:count]])
    return timestamps[ci], ci


# ---------------------------------------------------------------------------
# Volume bars (reset semantics -> ring with carried base)
# ---------------------------------------------------------------------------

def sharded_volume_bar_indexer(timestamps, volumes, threshold: float,
                               mesh: Mesh, axis_name: str = "t",
                               amount_units=None, amount_scale=None,
                               max_bars_per_shard: Optional[int] = None):
    """Mesh volume-bar indexer (reset-to-zero semantics).

    The carry is the volume accumulated since the last boundary; each
    ring step runs the shard-local searchsorted-jump scan
    (bar.indexers._volume_boundaries) seeded with ``base = -carry``.
    """
    timestamps = np.asarray(timestamps)
    n = timestamps.shape[0]
    n_shards = mesh.shape[axis_name]
    if amount_units is not None:
        v = np.asarray(amount_units, np.int64)
        thr = float(threshold) / amount_scale
        total = float(v.sum())
    else:
        v = np.asarray(volumes, np.float64)
        thr = float(threshold)
        total = float(v.sum())
    mb = max_bars_per_shard or min(max(int(total / thr) + 2, 2), n)
    v_sh = _place(v, mesh, axis_name, fill="zero")
    local_n = v_sh.shape[0] // n_shards

    def prog(v_local):
        me = lax.axis_index(axis_name)
        off = me.astype(jnp.int64) * local_n
        nv = jnp.clip(n - off, 0, local_n)
        lc = jnp.cumsum(v_local)

        def local_fn(carry):
            (base_carry,) = carry
            pos0 = jnp.where(me == 0, jnp.int64(0), jnp.int64(-1))
            out, k, base_f = _volume_boundaries(
                lc, thr, mb, base_init=-base_carry, pos_init=pos0, n_valid=nv)
            end_val = jnp.where(nv > 0, lc[jnp.clip(nv - 1, 0, local_n - 1)],
                                jnp.zeros((), lc.dtype)).astype(jnp.float64)
            carry_out = jnp.where(nv > 0, end_val - base_f, base_carry)
            out = jnp.where(jnp.arange(mb) < k, out + off, 0)
            return out, k, (carry_out,)

        out, cnt, _ = _ring(local_fn, (jnp.float64(0.0),), n_shards,
                            axis_name, mb)
        return out, cnt.reshape(1)

    fn = shard_map(prog, mesh=mesh, in_specs=(P(axis_name),),
                   out_specs=(P(axis_name), P(axis_name)), check_vma=False)
    out, cnt = jax.jit(fn)(v_sh)
    ci = _assemble(out, cnt, mb)
    return timestamps[ci], ci


# ---------------------------------------------------------------------------
# CUSUM bars (s+/s- carry ring, halo exchange for rets / print blocks)
# ---------------------------------------------------------------------------

def sharded_cusum_bar_indexer(timestamps, prices, sigma, sigma_floor: float,
                              sigma_mult: float, mesh: Mesh,
                              axis_name: str = "t",
                              max_bars_per_shard: Optional[int] = None):
    """Mesh CUSUM bar indexer.

    Carry = (s_pos, s_neg); halos: previous shard's last price (log
    returns) and next shard's first timestamp (same-print-block rule);
    sigma forward-fill carries the last valid value across shards.
    Reuses the single-device chunked event-jump scan per shard.
    """
    timestamps = np.asarray(timestamps)
    prices = np.asarray(prices, np.float64)
    sigma = np.asarray(sigma, np.float64)
    n = timestamps.shape[0]
    n_shards = mesh.shape[axis_name]
    mb = max_bars_per_shard or max(min(n, 1 << 20), 2)

    ts_sh = _place(timestamps, mesh, axis_name)
    px_sh = _place(prices, mesh, axis_name)
    sg_sh = _place(sigma, mesh, axis_name)
    local_n = ts_sh.shape[0] // n_shards
    fwd = [(k, (k + 1) % n_shards) for k in range(n_shards)]
    bwd = [((k + 1) % n_shards, k) for k in range(n_shards)]

    def prog(ts_local, px_local, sg_local):
        me = lax.axis_index(axis_name)
        off = me.astype(jnp.int64) * local_n
        gidx = off + jnp.arange(local_n, dtype=jnp.int64)

        # --- sigma forward-fill with cross-shard carry ---
        isnan = jnp.isnan(sg_local)
        idx = jnp.arange(local_n)
        last_valid = lax.cummax(jnp.where(isnan, -1, idx))
        sig_f = sg_local[jnp.clip(last_valid, 0, local_n - 1)]
        has_local = jnp.any(~isnan)
        last_val = sg_local[jnp.clip(jnp.max(jnp.where(isnan, -1, idx)), 0,
                                     local_n - 1)]
        vals_g = lax.all_gather(jnp.where(has_local, last_val, jnp.nan),
                                axis_name)
        has_g = lax.all_gather(has_local, axis_name)
        sh_ids = jnp.arange(n_shards)
        prev_ok = has_g & (sh_ids < me)
        prev_idx = jnp.max(jnp.where(prev_ok, sh_ids, -1))
        carry_sig = jnp.where(prev_idx >= 0,
                              vals_g[jnp.clip(prev_idx, 0, n_shards - 1)],
                              jnp.nan)
        sig_filled = jnp.where(last_valid >= 0, sig_f, carry_sig)

        # global first-valid sigma index
        local_first = jnp.where(has_local,
                                jnp.argmax(~isnan).astype(jnp.int64) + off,
                                jnp.int64(n))
        first_valid = lax.all_gather(local_first, axis_name).min()

        # --- halos ---
        prev_px = lax.ppermute(px_local[-1], axis_name, fwd)
        next_ts = lax.ppermute(ts_local[0], axis_name, bwd)

        log_p = jnp.log(px_local)
        log_prev = jnp.log(jnp.where(me == 0, px_local[0], prev_px))
        prev_logs = jnp.concatenate([log_prev[None], log_p[:-1]])
        rets = log_p - prev_logs
        scan_on = (gidx > first_valid) & (gidx < n)
        rets = jnp.where(scan_on, rets, 0.0)
        lam = jnp.maximum(sigma_mult * sig_filled, sigma_floor)
        lam = jnp.where(scan_on, lam, jnp.inf)

        nxt = jnp.concatenate([ts_local[1:], next_ts[None]])
        can_close = (ts_local != nxt) | (gidx == n - 1)

        def local_fn(carry):
            sp0, sn0 = carry
            out, k, sp_f, sn_f = _cusum_boundaries(
                rets, lam, can_close, jnp.int64(-1), mb, _CUSUM_CHUNK,
                sp_init=sp0, sn_init=sn0)
            out = jnp.where(jnp.arange(mb) < k, out + off, 0)
            return out, k, (sp_f, sn_f)

        out, cnt, _ = _ring(local_fn, (jnp.float64(0.0), jnp.float64(0.0)),
                            n_shards, axis_name, mb)
        return out, cnt.reshape(1), sig_filled

    fn = shard_map(prog, mesh=mesh,
                   in_specs=(P(axis_name), P(axis_name), P(axis_name)),
                   out_specs=(P(axis_name), P(axis_name), P(axis_name)),
                   check_vma=False)
    out, cnt, sig_filled = jax.jit(fn)(ts_sh, px_sh, sg_sh)
    first_valid = int(np.argmin(np.isnan(sigma))) if np.isnan(sigma).any() \
        else 0
    ci = _assemble(out, cnt, mb, anchor=first_valid)
    return timestamps[ci], ci, np.asarray(sig_filled)[:n]


# ---------------------------------------------------------------------------
# Imbalance / run bars (EMA-expectation carry ring)
# ---------------------------------------------------------------------------

def _sharded_info_bar(timestamps, sides, weights, threshold,
                      expected_ticks_init, expected_rate_init, alpha_ticks,
                      alpha_rate, mesh, axis_name, run_mode,
                      max_bars_per_shard):
    timestamps = np.asarray(timestamps)
    n = timestamps.shape[0]
    n_shards = mesh.shape[axis_name]
    if threshold is not None:
        if alpha_ticks or alpha_rate:
            raise ValueError("threshold= selects fixed mode; EMA alphas must be 0")
        expected_ticks_init, expected_rate_init = 1.0, float(threshold)
    if expected_ticks_init is None or expected_rate_init is None:
        raise ValueError("provide either threshold= or both "
                         "expected_ticks_init= and expected_rate_init=")
    w = np.asarray(sides, np.float64) if weights is None \
        else np.asarray(sides, np.float64) * np.asarray(weights, np.float64)
    w[:1] = 0.0  # trade 0 only opens the first bar (single-device pos0=1)
    mb = max_bars_per_shard or max(min(n, 1 << 20), 2)
    w_sh = _place(w, mesh, axis_name, fill="zero")
    local_n = w_sh.shape[0] // n_shards
    et0, er0 = float(expected_ticks_init), float(expected_rate_init)
    at, ar = float(alpha_ticks), float(alpha_rate)

    def prog(w_local):
        me = lax.axis_index(axis_name)
        off = me.astype(jnp.int64) * local_n
        gidx = off + jnp.arange(local_n, dtype=jnp.int64)
        wl = jnp.where(gidx < n, w_local, 0.0)

        def local_fn(carry):
            cb, cs, e_t, e_r, op_g = carry
            out, k, (cb_f, cs_f, et_f, er_f, op_f) = _info_bar_boundaries(
                wl, et0, er0, at, ar, mb, _IMB_CHUNK, run_mode,
                state_init=(cb, cs, e_t, e_r, op_g - off))
            out = jnp.where(jnp.arange(mb) < k, out + off, 0)
            return out, k, (cb_f, cs_f, et_f, er_f, op_f + off)

        carry0 = (jnp.float64(0.0), jnp.float64(0.0), jnp.float64(et0),
                  jnp.float64(er0), jnp.int64(0))
        out, cnt, _ = _ring(local_fn, carry0, n_shards, axis_name, mb)
        return out, cnt.reshape(1)

    fn = shard_map(prog, mesh=mesh, in_specs=(P(axis_name),),
                   out_specs=(P(axis_name), P(axis_name)), check_vma=False)
    out, cnt = jax.jit(fn)(w_sh)
    ci = _assemble(out, cnt, mb)
    return timestamps[ci], ci


def sharded_imbalance_bar_indexer(timestamps, sides, weights=None, *,
                                  threshold=None, expected_ticks_init=None,
                                  expected_rate_init=None, alpha_ticks=0.0,
                                  alpha_rate=0.0, mesh=None, axis_name="t",
                                  max_bars_per_shard=None):
    """Mesh imbalance-bar indexer (AFML ch. 2.3.2.1 semantics, see
    bar.indexers.imbalance_bar_indexer). Carry = (in-bar cums, EMA
    expectations, open position)."""
    return _sharded_info_bar(timestamps, sides, weights, threshold,
                             expected_ticks_init, expected_rate_init,
                             alpha_ticks, alpha_rate, mesh, axis_name,
                             run_mode=False,
                             max_bars_per_shard=max_bars_per_shard)


def sharded_run_bar_indexer(timestamps, sides, weights=None, *,
                            threshold=None, expected_ticks_init=None,
                            expected_rate_init=None, alpha_ticks=0.0,
                            alpha_rate=0.0, mesh=None, axis_name="t",
                            max_bars_per_shard=None):
    """Mesh run-bar indexer (AFML ch. 2.3.2.3 semantics, see
    bar.indexers.run_bar_indexer)."""
    return _sharded_info_bar(timestamps, sides, weights, threshold,
                             expected_ticks_init, expected_rate_init,
                             alpha_ticks, alpha_rate, mesh, axis_name,
                             run_mode=True,
                             max_bars_per_shard=max_bars_per_shard)

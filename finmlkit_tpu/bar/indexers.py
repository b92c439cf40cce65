"""Bar close-index computation (the "indexer" layer).

TPU-native re-design of /root/reference/finmlkit/bar/logic.py. The
reference walks the trade stream sequentially per bar type; here each
indexer is re-derived as a vectorized XLA program:

- time bars   -> pure searchsorted on a bar clock (logic.py:12-51)
- tick bars   -> closed-form arithmetic progression (logic.py:54-84)
- dollar bars -> carry-preserving thresholding is equivalent to
  ``floor(cumsum/T)`` crossings, so boundaries are a batched searchsorted
  plus a cummax bump for the one-boundary-per-trade rule (logic.py:118-149)
- volume bars -> reset-to-zero thresholding; each boundary is a
  searchsorted jump from the previous one (O(n_bars log n) total instead
  of O(n_trades)) (logic.py:87-115)
- CUSUM bars  -> non-associative reset scan; processed in vectorized
  chunks using the closed form s+_t = max(s0 + R_t, R_t - cummin(R)_t),
  jumping from event to event (logic.py:152-221)

All indexers return ``(close_ts, close_indices)`` with the reference's
convention: element 0 is the open anchor of the first bar; bar *i* spans
trades ``(ci[i], ci[i+1]]``.
"""
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Time bars
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_clock", "step_i", "start_i", "inv_step"))
def _time_bar_ci(timestamps, start_f, n_clock: int, step_i: int,
                 start_i: int, inv_step: float):
    """LEGACY (round 3-4) per-clock-bin counts via binning + scatter-add.

    SUPERSEDED by :func:`_time_bar_ci_ranked`: the 39M-update scatter-add
    secretly hit XLA's ~100 ns/update serial path (3.6 s/month on chip;
    `block_until_ready` returns early through the tunnel, which is how
    it masqueraded as 3 ms for two rounds — see BENCH_NOTES.md round 5).
    Kept for scripts/profile_indexer.py A/B probes.

    Avoids both searchsorted (random gathers — the slowest TPU executing
    primitive) and f64 multiply/divide (pathological compile times on
    this TPU): the approximate bin comes from an f32 reciprocal multiply
    (error << one bar), then two exact corrections compare against the
    reference's f64-rounded clock values, reconstructed per-element as
    ``int64(start_f + f64(k*step_i))`` — the same rounding np.arange
    produces, using only an int multiply, an exact int->f64 convert and
    one f64 add.
    """
    n = timestamps.shape[0]

    def clock_at(k):
        prod = (k * step_i).astype(jnp.float64)  # exact: |k*step| < 2^53
        return (start_f + prod).astype(jnp.int64)

    # two-stage f32 reciprocal multiply (int64/f64 division both compile
    # pathologically on this TPU): stage 1 bins to ~1e-7*n_clock bins,
    # stage 2 refines on the small residual, then two exact corrections
    # absorb the <=256ns f64 jitter of the clock values
    rel = (timestamps - start_i).astype(jnp.float32)
    b = jnp.floor(rel * jnp.float32(inv_step)).astype(jnp.int64)
    resid = (timestamps - clock_at(b)).astype(jnp.float32)
    b = b + jnp.floor(resid * jnp.float32(inv_step)).astype(jnp.int64)
    b = jnp.where(timestamps <= clock_at(b), b - 1, b)
    b = jnp.where(timestamps > clock_at(b + 1), b + 1, b)
    # trade in bin b  <=>  clock[b] < ts <= clock[b+1]; ts <= clock[0] -> b = -1
    cnt = jnp.zeros((n_clock + 1,), jnp.int64)
    return cnt.at[jnp.clip(b + 1, 0, n_clock)].add(1)


def time_bar_indexer(timestamps: jnp.ndarray, interval_seconds: float,
                     ts_first: int | None = None, ts_last_i: int | None = None):
    """Vectorized time-bar indexer.

    Parity: /root/reference/finmlkit/bar/logic.py:12-51 including its
    float64 bar-clock arithmetic (the reference computes the clock with
    f64 ``//``/``ceil``/``arange``, so boundary values inherit f64
    rounding at ns scale; we replicate that bit-for-bit).

    ``ts_first``/``ts_last_i`` (host ints) avoid device scalar readbacks,
    which are extremely slow on this TPU's transport.
    """
    step = float(interval_seconds) * 1e9  # f64 bar interval in ns
    ts0 = float(timestamps[0]) if ts_first is None else float(ts_first)
    ts_last = float(timestamps[-1]) if ts_last_i is None else float(ts_last_i)
    start = math.floor(ts0 / step) * step
    last = math.ceil(ts_last / step) * step
    stop = last + step + 1.0
    n_clock = int(np.ceil((stop - start) / step))
    # ci[k] = #{ts <= clock[k]} - 1 = rank of clock[k]+1 among the sorted
    # timestamps, via the blocked rank search (no scatter, no cumsum —
    # the round-3/4 scatter-add binning was secretly XLA's ~100ns/update
    # serial path, 3.6s/month; see _blocked_rank_lt)
    n = int(timestamps.shape[0])
    ci = _time_bar_ci_ranked(timestamps, jnp.float64(start), n_clock,
                             step, _pad_rows_16384(n))
    # the clock itself is rebuilt ON DEVICE with the same f64 arithmetic
    # as the reference's np.arange expression (bit-identical rounding)
    clock = _time_clock(jnp.float64(start), n_clock, step)
    return clock, ci


@partial(jax.jit, static_argnames=("n_clock", "step"))
def _time_clock(start_f, n_clock: int, step: float):
    return (start_f + jnp.arange(n_clock, dtype=jnp.float64)
            * jnp.float64(step)).astype(jnp.int64)


def _pad_rows_16384(n: int) -> int:
    return ((n + 16383) // 16384) * 16384


@partial(jax.jit, static_argnames=("n_clock", "step", "n_pad"))
def _time_bar_ci_ranked(timestamps, start_f, n_clock: int, step: float,
                        n_pad: int):
    n = timestamps.shape[0]
    clock = _time_clock(start_f, n_clock, step)
    pad = n_pad - n
    tsp = jnp.concatenate(
        [timestamps, jnp.full((pad,), jnp.iinfo(jnp.int64).max,
                              jnp.int64)]) if pad else timestamps
    chi, clo = _split_i64(tsp.reshape(-1, 128))
    uh, ul = _split_i64(clock + 1)  # #{ts <= c} = #{ts < c+1}
    return _blocked_rank_lt(chi, clo, uh, ul) - 1


# ---------------------------------------------------------------------------
# Tick bars
# ---------------------------------------------------------------------------

def tick_bar_indexer(timestamps: jnp.ndarray, threshold: int):
    """Closed-form tick-bar indexer.

    Parity: /root/reference/finmlkit/bar/logic.py:54-84. The sequential
    counter emits its first boundary at ``max(threshold-1, 1)`` and then
    every ``max(threshold, 1)`` trades; no scan needed.
    """
    n = timestamps.shape[0]
    step = max(int(threshold), 1)
    first = max(int(threshold) - 1, 1)
    boundaries = np.arange(first, n, step, dtype=np.int64)
    ci = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.asarray(boundaries)])
    return timestamps[ci], ci


# ---------------------------------------------------------------------------
# Dollar bars (carry remainder -> global cumsum crossings)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_bars",))
def _dollar_boundaries(cumdollar: jnp.ndarray, threshold: float, max_bars: int):
    n = cumdollar.shape[0]
    m = jnp.arange(1, max_bars + 1, dtype=jnp.float64)
    naive = jnp.searchsorted(cumdollar, m * threshold, side="left").astype(jnp.int64)
    naive = jnp.maximum(naive, 1)  # threshold check starts at trade 1
    mi = jnp.arange(1, max_bars + 1, dtype=jnp.int64)
    # enforce b_m >= b_{m-1}+1:  b_m = m + cummax(naive_m - m)
    b = mi + jax.lax.cummax(naive - mi)
    count = jnp.sum(b <= n - 1)
    return b, count


def dollar_bar_indexer(timestamps: jnp.ndarray, prices: jnp.ndarray,
                       volumes: jnp.ndarray, threshold: float):
    """Vectorized dollar-bar indexer.

    Parity: /root/reference/finmlkit/bar/logic.py:118-149. Because the
    reference carries the remainder (``cum -= threshold``), the running
    total never resets, and the m-th boundary is the first trade where the
    global dollar cumsum crosses ``m*threshold`` (bumped to be strictly
    after the previous boundary). One batched searchsorted + one cummax.
    """
    c = jnp.cumsum(prices.astype(jnp.float64) * volumes.astype(jnp.float64))
    total = float(c[-1])  # one scalar readback (f64 CPU path only)
    max_bars = min(max(int(total / float(threshold)) + 1, 1), c.shape[0])
    b, count = _dollar_boundaries(c, float(threshold), max_bars)
    count = int(count)
    ci = jnp.concatenate([jnp.zeros((1,), jnp.int64), b[:count]])
    return timestamps[ci], ci


_DOLLAR_SHIFT = 6  # >>6 keeps a month of tick*unit dollars inside int64
_BIAS32 = np.int32(-2147483648)


def _pair_lt(ah, al, bh, bl):
    """(ah, al) < (bh, bl) for int64 (hi, unsigned-lo) int32 pairs."""
    return (ah < bh) | ((ah == bh) & ((al + _BIAS32) < (bl + _BIAS32)))


def _split_i64(x):
    return ((x >> 32).astype(jnp.int32),
            x.astype(jnp.uint32).astype(jnp.int32))


def _blocked_rank_lt(chi, clo, uh, ul):
    """rank[t] = #{c < u_t} over a SORTED pair-encoded (rows, 128) array,
    without elementwise gathers.

    XLA lowers ``searchsorted`` into a serial binary search of
    one-element gathers (~100 ns/step on this TPU — the hidden 3.6 s
    cost of the round-3/4 time indexer). This replacement is three rank
    levels: a broadcast compare against the ~rows/128 block tails, then
    one ROW gather of 128 row tails per target + compare-count, then one
    row gather of the element row + compare-count. Row gathers (128
    contiguous lanes) are the fast gather shape on this TPU.

    Preconditions: ``c`` nondecreasing; rows beyond the logical stream
    padded with the final value or +inf (both count correctly against
    in-range and beyond-range targets respectively).
    """
    n_rows = chi.shape[0]
    r2 = (n_rows + 127) // 128

    rt_h = chi[:, -1]
    rt_l = clo[:, -1]
    pad = r2 * 128 - n_rows
    if pad:
        rt_h = jnp.concatenate([rt_h, jnp.full((pad,), 0x7FFFFFFF,
                                               jnp.int32)])
        rt_l = jnp.concatenate([rt_l, jnp.full((pad,), -1, jnp.int32)])
    rt_h2 = rt_h.reshape(r2, 128)
    rt_l2 = rt_l.reshape(r2, 128)
    bt_h = rt_h2[:, -1]
    bt_l = rt_l2[:, -1]

    blk = jnp.sum(_pair_lt(bt_h[None, :], bt_l[None, :],
                           uh[:, None], ul[:, None]),
                  axis=1, dtype=jnp.int32)
    blk_c = jnp.minimum(blk, r2 - 1)

    g_h = rt_h2[blk_c]
    g_l = rt_l2[blk_c]
    rin = jnp.sum(_pair_lt(g_h, g_l, uh[:, None], ul[:, None]),
                  axis=1, dtype=jnp.int32)
    row = blk_c * 128 + rin
    row_c = jnp.minimum(row, n_rows - 1)

    c_h = chi[row_c]
    c_l = clo[row_c]
    lane = jnp.sum(_pair_lt(c_h, c_l, uh[:, None], ul[:, None]),
                   axis=1, dtype=jnp.int32)
    return row_c.astype(jnp.int64) * 128 + lane.astype(jnp.int64)


def _gather_lane(x2d, pos):
    """Two-level gather: row fetch then lane select (bar/fused.py _g)."""
    rows = x2d[pos >> 7]
    return rows[jnp.arange(pos.shape[0]), pos & 127]


@partial(jax.jit, static_argnames=("n_pad",))
def _dollar_prep_pallas(price_ticks, amount_units, n_pad: int):
    """Dollar-unit planes for the Pallas pair cumsum (one jit)."""
    d = (price_ticks.astype(jnp.int64) * amount_units) >> _DOLLAR_SHIFT
    pad = n_pad - d.shape[0]
    if pad:
        d = jnp.concatenate([d, jnp.zeros((pad,), jnp.int64)])
    hi = (d >> 32).astype(jnp.int32).reshape(-1, 128)
    lo = d.astype(jnp.uint32).astype(jnp.int32).reshape(-1, 128)
    return hi, lo


@partial(jax.jit, static_argnames=("max_bars", "n"))
def _dollar_boundaries_blocked(chi, clo, threshold: float, max_bars: int,
                               n: int):
    """Boundary positions from the pair-encoded dollar cumsum WITHOUT
    elementwise gathers.

    ``searchsorted`` of the ~n_bars targets into the 39M-element cumsum
    is XLA's serial-gather path (~26 binary-search steps of one-element
    gathers each — the dominant cost of the round-4 dollar indexer at
    172 ms). Replaced by rank computation over the blocked layout:

    1. integer targets ``u_m = ceil(m * threshold)`` (exact: the cumsum
       is integral, so ``c >= m*thr  <=>  c >= ceil(m*thr)``);
    2. a broadcast compare against the ~n_rows/128 block tails (rank of
       each target among blocks — vector ops, no gathers);
    3. one ROW gather (128 contiguous lanes — the fast gather shape on
       this TPU) of row tails per target + a compare-count;
    4. one row gather of the trade-level cumsum row + compare-count.

    Positions beyond the stream resolve to >= n and are dropped by the
    caller's count filter, exactly like the searchsorted path.
    """
    m = jnp.arange(1, max_bars + 1, dtype=jnp.float64)
    u = jnp.ceil(m * threshold).astype(jnp.int64)
    uh, ul = _split_i64(u)
    naive = _blocked_rank_lt(chi, clo, uh, ul)
    naive = jnp.maximum(naive, 1)  # threshold check starts at trade 1
    mi = jnp.arange(1, max_bars + 1, dtype=jnp.int64)
    b = mi + jax.lax.cummax(naive - mi)
    count = jnp.sum(b <= n - 1)
    return b, count


def dollar_bar_indexer_q(timestamps, price_ticks, amount_units, threshold,
                         tick_size, amount_scale, max_bars: int = None):
    """Integer-exact dollar-bar indexer over quantized trades.

    Dollar flow per trade is ``ticks * units`` (int64), right-shifted by
    6 bits so the monthly cumsum stays inside int64 (the shift discards
    < 1e-6 dollars per trade). The cumsum is exact and monotone, so
    boundaries are threshold-crossing ranks via the blocked compare path
    (:func:`_dollar_boundaries_blocked`; the round-4 searchsorted
    formulation measured 172 ms at 39M trades — see BENCH_EXTRA.json for
    the round-5 number). The cumsum runs as the Pallas pair scan on TPU
    and as jnp.cumsum off-TPU; the rank logic is identical on both.
    """
    from ..ops.pallas_scan import _cumsum_2d_i64, _runs_on_tpu

    thr_scaled = float(threshold) / (tick_size * amount_scale) / (1 << _DOLLAR_SHIFT)
    n = int(price_ticks.shape[0])
    on_tpu = _runs_on_tpu(price_ticks)
    n_pad = ((n + 32767) // 32768) * 32768
    if on_tpu:
        hi, lo = _dollar_prep_pallas(price_ticks, amount_units, n_pad)
        chi, clo = _cumsum_2d_i64(hi, lo)
    else:  # same blocked rank path, jnp cumsum (Pallas needs the TPU)
        d = (price_ticks.astype(jnp.int64) * amount_units) >> _DOLLAR_SHIFT
        c = jnp.cumsum(d)
        c = jnp.concatenate(
            [c, jnp.broadcast_to(c[-1:], (n_pad - n,))]) if n_pad > n else c
        chi = (c >> 32).astype(jnp.int32).reshape(-1, 128)
        clo = c.astype(jnp.uint32).astype(jnp.int32).reshape(-1, 128)
    if max_bars is None:
        last = n - 1
        # ONE tiny fetch for both carry words (each host fetch pays a
        # full transport round-trip; pass ``max_bars`` to skip it when
        # the caller knows an upper bound on the bar count)
        hilo = np.asarray(jnp.stack([chi[last >> 7, last & 127],
                                     clo[last >> 7, last & 127]]))
        total = float((int(hilo[0]) << 32) | (int(hilo[1]) & 0xFFFFFFFF))
        max_bars = int(total / thr_scaled) + 1
    max_bars = min(max(max_bars, 1), n)
    b, count = _dollar_boundaries_blocked(chi, clo, thr_scaled,
                                          max_bars, n)
    count = int(count)
    ci = jnp.concatenate([jnp.zeros((1,), jnp.int64), b[:count]])
    ts2 = jnp.concatenate(
        [timestamps,
         jnp.zeros(((-n) % 128,), timestamps.dtype)]).reshape(-1, 128) \
        if n % 128 else timestamps.reshape(-1, 128)
    return _gather_lane(ts2, ci.astype(jnp.int32)), ci


def volume_bar_indexer_q(timestamps, amount_units, threshold, amount_scale):
    """Integer-exact volume-bar indexer (cumsum of int64 amount units)."""
    c = jnp.cumsum(amount_units)
    thr_units = float(threshold) / amount_scale
    total = float(c[-1])
    max_bars = min(max(int(total / thr_units) + 2, 2), c.shape[0])
    out, k, _ = _volume_boundaries(c, thr_units, max_bars)
    count = int(k)
    ci = jnp.concatenate([jnp.zeros((1,), jnp.int64), out[:count]])
    return timestamps[ci], ci


# ---------------------------------------------------------------------------
# Volume bars (reset to zero -> searchsorted jumps)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_bars",))
def _volume_boundaries(cumvol: jnp.ndarray, threshold: float, max_bars: int,
                       base_init=None, pos_init=None, n_valid=None):
    """Reset-semantics boundary jumps over an inclusive cumsum.

    ``base_init`` seeds the reset base (``-carried_volume`` lets a shard
    continue a bar opened upstream, see parallel/sharded_indexers.py);
    ``pos_init`` the predecessor position (-1 allows a boundary at local
    index 0 on non-first shards); ``n_valid`` bounds the scannable range
    (padding exclusion). Returns ``(out, k, final_base)`` where
    ``final_base`` is the cumsum value at the last boundary (reset base).
    """
    n = cumvol.shape[0]
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.int64)

    def cond(state):
        pos, _, k, _ = state
        return (pos < nv) & (k < max_bars)

    def body(state):
        pos, base, k, out = state
        nxt = jnp.searchsorted(cumvol, base + threshold, side="left").astype(jnp.int64)
        nxt = jnp.maximum(nxt, pos + 1)
        hit = nxt <= nv - 1
        out = out.at[k].set(jnp.where(hit, nxt, out[k]))
        new_base = cumvol[jnp.minimum(nxt, n - 1)].astype(jnp.float64)
        return (jnp.where(hit, nxt, nv),
                jnp.where(hit, new_base, base),
                k + jnp.where(hit, 1, 0),
                out)

    out = jnp.zeros((max_bars,), jnp.int64)
    base0 = jnp.float64(0.0) if base_init is None else jnp.asarray(base_init, jnp.float64)
    pos0 = jnp.int64(0) if pos_init is None else jnp.asarray(pos_init, jnp.int64)
    init = (pos0, base0, jnp.int64(0), out)
    _, base_f, k, out = jax.lax.while_loop(cond, body, init)
    return out, k, base_f


def volume_bar_indexer(timestamps: jnp.ndarray, volumes: jnp.ndarray, threshold: float):
    """Volume-bar indexer with reset-to-zero semantics.

    Parity: /root/reference/finmlkit/bar/logic.py:87-115 (cum volume
    resets to 0 at each boundary, discarding the overshoot — unlike dollar
    bars). Each boundary is found by a searchsorted jump from the previous
    boundary's cumsum, so the loop runs O(n_bars) iterations, not O(n).
    """
    c = jnp.cumsum(volumes.astype(jnp.float64))
    total = float(c[-1])
    max_bars = min(max(int(total / float(threshold)) + 2, 2), c.shape[0])
    out, k, _ = _volume_boundaries(c, float(threshold), max_bars)
    count = int(k)
    ci = jnp.concatenate([jnp.zeros((1,), jnp.int64), out[:count]])
    return timestamps[ci], ci


# ---------------------------------------------------------------------------
# Native host boundary scans (volume / dollar / CUSUM)
#
# The sequential boundary scans are latency-bound host workloads exactly
# like the reference's Numba loops (logic.py:87-221); the C++ kernels in
# finmlkit_tpu/native run them at machine speed with reference-identical
# f64 accumulation order. Each helper returns None without the native
# toolchain — callers fall back to the device scans above.
# ---------------------------------------------------------------------------

def volume_bar_indexer_host(timestamps, volumes, threshold: float):
    """Host-native volume-bar boundaries (reference logic.py:87-115)."""
    from .. import native
    volumes = np.asarray(volumes, np.float32)
    # reset discards the overshoot, so every bar consumes >= threshold
    mb = int(float(volumes.astype(np.float64).sum()) / float(threshold)) + 2
    out = native.volume_bar_boundaries(volumes, float(threshold), mb)
    if out is None:
        return None
    ci = np.concatenate([np.zeros(1, np.int64), out])
    return np.asarray(timestamps)[ci], ci


def dollar_bar_indexer_host(timestamps, prices, volumes, threshold: float):
    """Host-native dollar-bar boundaries (reference logic.py:118-149)."""
    from .. import native
    prices = np.asarray(prices, np.float64)
    volumes = np.asarray(volumes, np.float32)
    total = float((prices * volumes).sum())
    mb = int(total / float(threshold)) + 2
    out = native.dollar_bar_boundaries(prices, volumes, float(threshold), mb)
    if out is None:
        return None
    ci = np.concatenate([np.zeros(1, np.int64), out])
    return np.asarray(timestamps)[ci], ci


def cusum_bar_indexer_host(timestamps, prices, sigma, sigma_floor: float,
                           sigma_mult: float):
    """Host-native CUSUM bar boundaries (reference logic.py:152-221).

    Exact f64 reference semantics (adaptive threshold, NaN-sigma forward
    fill, same-print-block rule, one-sided resets). Returns
    (close_ts, ci, filled_sigma) or None without the toolchain.
    """
    from .. import native
    if native.lib() is None:
        return None
    timestamps = np.asarray(timestamps, np.int64)
    prices = np.asarray(prices, np.float64)
    sigma = np.asarray(sigma, np.float64)
    n = len(prices)

    isnan = np.isnan(sigma)
    first_valid = int(np.argmin(isnan))  # 0 when no NaNs (or all NaN)
    idx = np.arange(n)
    last_valid = np.maximum.accumulate(np.where(isnan, -1, idx))
    sig_filled = sigma[np.clip(last_valid, 0, n - 1)]
    lam = np.maximum(sigma_mult * sig_filled, sigma_floor)

    log_p = np.log(prices)
    rets = np.concatenate([[0.0], np.diff(log_p)])

    mb = max(min(n, 1 << 20), 2)
    while True:
        out = native.cusum_bar_boundaries(rets, lam, timestamps,
                                          first_valid, mb)
        if out is None:
            return None
        if len(out) < mb or mb >= n:
            break
        mb = min(mb * 4, n)  # buffer saturated: grow and re-run
    ci = np.concatenate([np.asarray([first_valid], np.int64), out])
    return timestamps[ci], ci, sig_filled


# ---------------------------------------------------------------------------
# CUSUM bars (chunked event-jump scan)
# ---------------------------------------------------------------------------

_CUSUM_CHUNK = 8192
_CUSUM_EVENTS_PER_CHUNK = 4   # unrolled in-chunk event extractions


@partial(jax.jit, static_argnames=("max_bars", "chunk"))
def _cusum_boundaries(rets: jnp.ndarray, lam: jnp.ndarray, can_close: jnp.ndarray,
                      start: jnp.ndarray, max_bars: int, chunk: int,
                      sp_init=None, sn_init=None):
    """Event-jump scan for the CUSUM bar indexer.

    ``rets[i]`` is the log return at trade i (0 where undefined), ``lam``
    the per-trade threshold, ``can_close`` the same-timestamp-block rule
    mask. Processes the stream in vectorized chunks, using the reset-scan
    closed form (s+ = max(s0 + R, R - cummin R); s- = min(s0 + R,
    R - cummax R)) which is valid up to the first event inside the chunk.

    ``sp_init``/``sn_init`` seed the CUSUM state (shard-boundary carry in
    the sharded indexer, see parallel/sharded_indexers.py); the scan
    begins at ``start + 1``. Returns ``(out, k, s_pos, s_neg)`` — the
    final state is the carry handed to the next shard.
    """
    n = rets.shape[0]
    pad = jnp.zeros((chunk,), rets.dtype)
    rets_p = jnp.concatenate([rets, pad])
    lam_p = jnp.concatenate([lam, jnp.full((chunk,), jnp.inf, lam.dtype)])
    can_p = jnp.concatenate([can_close, jnp.zeros((chunk,), jnp.bool_)])

    def cond(state):
        pos, _, _, k, _ = state
        return (pos < n) & (k < max_bars)

    iota = jnp.arange(chunk, dtype=jnp.int64)
    zero = jnp.zeros((), rets.dtype)
    K = _CUSUM_EVENTS_PER_CHUNK

    def body(state):
        # Up to K events are extracted per chunk slice (unrolled inner
        # steps): after an event at e the closed form restarts with the
        # prefix re-based at big[e] and the running min/max windowed to
        # (e, .] — one masked cummin/cummax pass per inner step. The
        # outer loop therefore advances a full chunk whenever a chunk
        # holds <= K events, instead of one bar per iteration (the
        # round-4 formulation's ~40k iterations at monthly counts).
        pos, sp0, sn0, k, out = state
        r = jax.lax.dynamic_slice(rets_p, (pos,), (chunk,))
        lm = jax.lax.dynamic_slice(lam_p, (pos,), (chunk,))
        cc = jax.lax.dynamic_slice(can_p, (pos,), (chunk,))
        big = jnp.cumsum(r)
        in_range = pos + iota < n
        valid_ev = cc & in_range

        sp, sn = sp0, sn0
        last_e = jnp.int64(-1)
        has = jnp.bool_(False)
        s_pos = s_neg = None
        for _ in range(K):
            mask = iota > last_e
            base = jnp.where(last_e >= 0, big[jnp.maximum(last_e, 0)],
                             zero)
            D = big - base
            runmin = jax.lax.cummin(jnp.where(mask, big, jnp.inf)) - base
            runmax = jax.lax.cummax(jnp.where(mask, big, -jnp.inf)) - base
            s_pos = jnp.maximum(sp + D, D - runmin)
            s_neg = jnp.minimum(sn + D, D - runmax)
            pos_hit = s_pos >= lm
            ev = mask & valid_ev & (pos_hit | (s_neg <= -lm))
            has = jnp.any(ev) & (k < max_bars)
            e = jnp.argmax(ev).astype(jnp.int64)
            out = out.at[jnp.minimum(k, max_bars - 1)].set(
                jnp.where(has, pos + e,
                          out[jnp.minimum(k, max_bars - 1)]))
            k = k + jnp.where(has, 1, 0)
            # reference resets only the triggered side; s+ precedence
            trig_pos = pos_hit[e]
            sp = jnp.where(has, jnp.where(trig_pos, zero, s_pos[e]), sp)
            sn = jnp.where(has, jnp.where(trig_pos, s_neg[e], zero), sn)
            last_e = jnp.where(has, e, last_e)

        # if the K-th step still found an event there may be more in
        # this chunk: re-enter at last_e + 1 with the post-event state.
        # Otherwise the final step's s arrays describe the last segment
        # and the chunk-end value is the carry.
        last = jnp.minimum(n - 1 - pos, chunk - 1)
        return (jnp.where(has, pos + last_e + 1, pos + chunk),
                jnp.where(has, sp, s_pos[last]),
                jnp.where(has, sn, s_neg[last]),
                k, out)

    out = jnp.zeros((max_bars,), jnp.int64)
    sp0 = zero if sp_init is None else jnp.asarray(sp_init, rets.dtype)
    sn0 = zero if sn_init is None else jnp.asarray(sn_init, rets.dtype)
    init = (start + 1, sp0, sn0, jnp.int64(0), out)
    _, sp_f, sn_f, k, out = jax.lax.while_loop(cond, body, init)
    return out, k, sp_f, sn_f


def cusum_bar_indexer(timestamps: jnp.ndarray, prices: jnp.ndarray,
                      sigma: jnp.ndarray, sigma_floor: float, sigma_mult: float,
                      max_bars: int | None = None, dtype=None):
    """CUSUM bar indexer with adaptive threshold and ms-print-block rule.

    Parity: /root/reference/finmlkit/bar/logic.py:152-221 — symmetric
    CUSUM on log returns; threshold ``max(sigma_mult*sigma[i],
    sigma_floor)``; NaN sigmas forward-filled from the first valid value;
    a bar cannot close while ``timestamps[i] == timestamps[i+1]`` (same
    print block); when s+ triggers only s+ resets (s- keeps running) and
    vice versa.

    Returns (close_ts, close_indices, filled_sigma).

    ``dtype`` selects scan precision: float64 (default; exact reference
    parity, CPU) or float32 (TPU fast path — f64 scans compile
    pathologically there; log returns keep ~1e-7 relative precision so
    boundaries at exact threshold equality may rarely shift).
    """
    from ..ops.pallas_scan import _runs_on_tpu, fast_ffill

    dt = jnp.float64 if dtype is None else jnp.dtype(dtype)
    n = prices.shape[0]
    sig = sigma.astype(dt)
    isnan = jnp.isnan(sig)
    first_valid = jnp.argmin(isnan).astype(jnp.int64)  # first non-NaN index
    # forward-fill NaNs (from first_valid on; leading NaNs are before
    # start). On TPU the gather formulation costs ~37ns/element (the
    # hidden 1.45s of the round-4 CUSUM config) — the Pallas last-fill
    # scan replaces it on the f32 fast path.
    if dt == jnp.float32 and _runs_on_tpu(sig):
        sig_filled = fast_ffill(sig, ~isnan)
    else:
        idx = jnp.arange(n)
        last_valid = jax.lax.cummax(jnp.where(isnan, -1, idx))
        sig_filled = sig[jnp.clip(last_valid, 0, n - 1)]
    lam = jnp.maximum(jnp.asarray(sigma_mult, dt) * sig_filled,
                      jnp.asarray(sigma_floor, dt))

    log_p = jnp.log(prices.astype(dt))
    rets = jnp.concatenate([jnp.zeros((1,), dt), jnp.diff(log_p)])
    can_close = jnp.concatenate([timestamps[:-1] != timestamps[1:],
                                 jnp.ones((1,), jnp.bool_)])

    # initial buffer 2^16 (grows 4x on saturation): the event buffer is
    # a while_loop carry and XLA copies it per .at[k].set — a 1M-element
    # buffer made the loop memory-bound (BENCH_NOTES round 5)
    mb = int(max_bars) if max_bars is not None else max(min(n, 1 << 16), 2)
    while True:
        out, k, _, _ = _cusum_boundaries(rets, lam, can_close, first_valid, mb,
                                         _CUSUM_CHUNK)
        count = int(k)
        if count < mb or mb >= n:
            break
        mb = min(mb * 4, n)  # buffer saturated: grow and re-run

    ci = jnp.concatenate([first_valid[None], out[:count]])
    return timestamps[ci], ci, sig_filled


# ---------------------------------------------------------------------------
# Imbalance / run bars (chunked event-jump scans)
#
# The reference declares these but raises NotImplementedError
# (logic.py:224-261; README roadmap unchecked) — this implementation
# EXCEEDS the reference. Semantics follow AFML ch. 2.3.2 (López de
# Prado, "information-driven bars") with expectations updated at bar
# closes: a bar closes at the first trade where the in-bar statistic
# reaches theta = E[T] * E[rate], where E[T] is an EMA of realized bar
# tick counts and E[rate] an EMA of the realized per-tick statistic
# rate. With both EMA alphas at 0 the threshold stays fixed at
# ``expected_ticks_init * expected_rate_init`` — the constant-threshold
# mode. Threshold changes only at closes, so within a chunk it is
# constant and the same vectorized first-crossing detection as the
# CUSUM indexer applies.
# ---------------------------------------------------------------------------

_IMB_CHUNK = 2048


@partial(jax.jit, static_argnames=("max_bars", "chunk", "run_mode"))
def _info_bar_boundaries(w, e_ticks0, e_rate0, alpha_t, alpha_r,
                         max_bars: int, chunk: int, run_mode: bool,
                         state_init=None):
    """Event-jump scan shared by imbalance and run bars.

    ``w`` is the signed per-trade contribution (side, side*volume, or
    side*dollar). Imbalance mode closes on |cumsum(w)| >= theta; run
    mode tracks buy and sell magnitudes separately and closes on
    max(cum_buy, cum_sell) >= theta.

    ``state_init`` optionally seeds ``(cum_buy, cum_sell, e_ticks,
    e_rate, open_pos)`` — the shard-boundary carry for the sharded
    indexer (``open_pos`` is relative to this array's index 0, i.e.
    negative when the open precedes the shard). Returns ``(out, k,
    final_state)``.
    """
    n = w.shape[0]
    w_p = jnp.concatenate([w, jnp.zeros((chunk,), w.dtype)])

    def cond(state):
        pos, _, _, _, _, _, k, _ = state
        return (pos < n) & (k < max_bars)

    def body(state):
        pos, cb, cs, e_t, e_r, open_pos, k, out = state
        r = jax.lax.dynamic_slice(w_p, (pos,), (chunk,))
        if run_mode:
            sb = cb + jnp.cumsum(jnp.where(r > 0, r, 0.0))
            ss = cs + jnp.cumsum(jnp.where(r < 0, -r, 0.0))
            stat = jnp.maximum(sb, ss)
        else:
            sb = cb + jnp.cumsum(r)
            ss = cs  # unused
            stat = jnp.abs(sb)
        theta = e_t * e_r
        in_range = pos + jnp.arange(chunk, dtype=jnp.int64) < n
        ev = in_range & (stat >= theta)
        has_ev = jnp.any(ev)
        e = jnp.argmax(ev).astype(jnp.int64)
        ev_idx = pos + e

        # EMA updates at the close (realized bar length and rate)
        t_bar = (ev_idx - open_pos).astype(w.dtype)
        rate = stat[e] / jnp.maximum(t_bar, 1.0)
        new_et = jnp.where(has_ev, (1 - alpha_t) * e_t + alpha_t * t_bar, e_t)
        new_er = jnp.where(has_ev, (1 - alpha_r) * e_r + alpha_r * rate, e_r)

        last = jnp.minimum(n - 1 - pos, chunk - 1)
        zero = jnp.zeros((), w.dtype)
        new_cb = jnp.where(has_ev, zero, sb[last])
        new_cs = jnp.where(has_ev, zero, ss[last]) if run_mode else ss

        out = out.at[k].set(jnp.where(has_ev, ev_idx, out[k]))
        return (jnp.where(has_ev, ev_idx + 1, pos + chunk),
                new_cb, new_cs, new_et, new_er,
                jnp.where(has_ev, ev_idx, open_pos),
                k + jnp.where(has_ev, 1, 0), out)

    zero = jnp.zeros((), w.dtype)
    out = jnp.zeros((max_bars,), jnp.int64)
    if state_init is None:
        # threshold checks start at trade 1 (trade 0 only opens the bar)
        init = (jnp.int64(1), zero, zero,
                jnp.asarray(e_ticks0, w.dtype), jnp.asarray(e_rate0, w.dtype),
                jnp.int64(0), jnp.int64(0), out)
    else:
        cb0, cs0, et0, er0, op0 = state_init
        init = (jnp.int64(0), jnp.asarray(cb0, w.dtype),
                jnp.asarray(cs0, w.dtype), jnp.asarray(et0, w.dtype),
                jnp.asarray(er0, w.dtype), jnp.asarray(op0, jnp.int64),
                jnp.int64(0), out)
    _, cb_f, cs_f, et_f, er_f, op_f, k, out = jax.lax.while_loop(cond, body, init)
    return out, k, (cb_f, cs_f, et_f, er_f, op_f)


def _info_bar_indexer(timestamps, sides, weights, expected_ticks_init,
                      expected_rate_init, alpha_ticks, alpha_rate, threshold,
                      max_bars, dtype, run_mode):
    dt = jnp.float64 if dtype is None else jnp.dtype(dtype)
    if threshold is not None:
        if alpha_ticks or alpha_rate:
            raise ValueError("threshold= selects fixed mode; EMA alphas must be 0")
        expected_ticks_init, expected_rate_init = 1.0, float(threshold)
    if expected_ticks_init is None or expected_rate_init is None:
        raise ValueError("provide either threshold= or both "
                         "expected_ticks_init= and expected_rate_init=")
    w = sides.astype(dt) if weights is None else sides.astype(dt) * weights.astype(dt)
    n = w.shape[0]
    user_cap = max_bars is not None
    mb = int(max_bars) if user_cap else max(min(n, 1 << 16), 2)
    while True:
        out, k, _ = _info_bar_boundaries(
            w, float(expected_ticks_init), float(expected_rate_init),
            float(alpha_ticks), float(alpha_rate), mb, _IMB_CHUNK, run_mode)
        count = int(k)
        if user_cap or count < mb or mb >= n:
            # a user-supplied max_bars is an explicit truncation/memory
            # bound: honor it instead of silently growing the buffer
            break
        if mb >= max(n // 8, 2):
            # adaptive-threshold runaway guard: theta = E[T]*E[rate] is
            # knife-edge unstable on driftless data — the downward
            # spiral reaches a bar per trade, whose event-jump loop
            # would then run past the TPU program watchdog (a hard
            # device fault). Fail loudly instead; pass max_bars= to
            # accept truncation.
            raise ValueError(
                f"info-bar threshold adapted into the every-trade "
                f"regime (> {mb} bars over {n} trades); raise the "
                f"initial expectations/alphas or pass max_bars=")
        mb = min(mb * 4, n)
    ci = jnp.concatenate([jnp.zeros((1,), jnp.int64), out[:count]])
    return timestamps[ci], ci


def imbalance_bar_indexer(timestamps, sides, weights=None, *,
                          threshold=None, expected_ticks_init=None,
                          expected_rate_init=None, alpha_ticks=0.0,
                          alpha_rate=0.0, max_bars=None, dtype=None):
    """Imbalance bars (tick/volume/dollar): close when the in-bar signed
    imbalance ``|sum(side_t * w_t)|`` reaches theta.

    The reference declares this and raises (logic.py:224-241); here it is
    implemented as a chunked event-jump scan (AFML ch. 2.3.2.1
    semantics, expectations updated at closes — see module comment).

    :param sides: ±1 tick-rule signs (i8).
    :param weights: per-trade magnitudes — None for tick imbalance,
        amounts for volume imbalance, price*amount for dollar imbalance.
    :param threshold: fixed theta (mutually exclusive with the EMA mode).
    :param expected_ticks_init: E0[T], initial expected bar tick count.
    :param expected_rate_init: E0[|imbalance|/tick] initial expectation.
    :param alpha_ticks, alpha_rate: EMA update rates applied at closes.
    :param dtype: scan precision — float64 (default) or float32 (TPU
        fast path, as in :func:`cusum_bar_indexer`).
    :returns: (close_ts, close_indices), reference ci convention.
    """
    return _info_bar_indexer(timestamps, sides, weights, expected_ticks_init,
                             expected_rate_init, alpha_ticks, alpha_rate,
                             threshold, max_bars, dtype, run_mode=False)


def run_bar_indexer(timestamps, sides, weights=None, *,
                    threshold=None, expected_ticks_init=None,
                    expected_rate_init=None, alpha_ticks=0.0,
                    alpha_rate=0.0, max_bars=None, dtype=None):
    """Run bars: close when ``max(sum of buy w, sum of sell w)`` within
    the bar reaches theta (AFML ch. 2.3.2.3; the one-sided "run" length
    dominance statistic). Reference declares-and-raises (logic.py:244-261).

    Parameters as in :func:`imbalance_bar_indexer`.
    """
    return _info_bar_indexer(timestamps, sides, weights, expected_ticks_init,
                             expected_rate_init, alpha_ticks, alpha_rate,
                             threshold, max_bars, dtype, run_mode=True)

"""Segment reductions over contiguous trade ranges.

TPU-native replacement for the reference's per-bar ``prange`` loops
(e.g. comp_bar_ohlcv at /root/reference/finmlkit/bar/base.py:306-407).
Bars are contiguous, sorted ranges of the trade axis delimited by
``close_indices`` (``ci``), with reference bar semantics: bar *i* covers
trades in the half-open-from-the-left interval ``(ci[i], ci[i+1]]``
(start-exclusive, end-inclusive; empty bar when ``ci[i] == ci[i+1]``).

Because the ranges are contiguous and sorted, *sums* reduce to prefix-sum
differences (one cumsum over trades + two gathers per bar — no scatter),
and *order statistics* (median / p95 / min / max) reduce to gathers into a
single globally sorted array keyed by ``(bar_id, value)`` packed into one
int64 sort key. min/max also have a direct ``segment_max`` path.
"""
from functools import partial

import jax
import jax.numpy as jnp


def bar_ids_from_close_indices(ci: jnp.ndarray, n_trades: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Map each trade index to its bar id.

    bar_id(j) = #{k >= 1 : ci[k] < j}. Computed as a scatter of ones at
    the bar-open positions followed by a prefix sum — O(n) streaming work
    instead of a searchsorted (whose random gathers are the slowest
    primitive on TPU).

    :param ci: int64 close indices, length n_bars+1; bar i = (ci[i], ci[i+1]].
    :param n_trades: length of the trade axis.
    :returns: (bar_id, valid) — bar_id in [0, n_bars) (clipped for invalid
        trades), valid mask for trades inside some bar.
    """
    # NOTE: plain jnp.cumsum here — this helper is used *inside* larger
    # jits (f64 reference path, footprints, shard_map), where a nested
    # Pallas call would hang the TPU compiler. The TPU fast path in
    # bar/aggregate_q.py computes bar ids via its own top-level
    # fast_cumsum_cols stage instead.
    idx = jnp.arange(n_trades, dtype=ci.dtype)
    n_bars = ci.shape[0] - 1
    marks = jnp.zeros((n_trades + 1,), jnp.int32)
    marks = marks.at[jnp.clip(ci[1:] + 1, 0, n_trades)].add(1)
    bar_id = jnp.cumsum(marks[:n_trades]).astype(ci.dtype)
    valid = (idx > ci[0]) & (idx <= ci[-1])
    return jnp.clip(bar_id, 0, n_bars - 1), valid


def range_sum(x: jnp.ndarray, ci: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Per-bar sum of ``x`` over ranges ``(ci[i], ci[i+1]]`` via prefix sums.

    One HBM pass (cumsum) + 2 gathers per bar instead of a scatter-add.
    """
    if dtype is not None:
        x = x.astype(dtype)
    # exclusive prefix: P[k] = sum(x[:k]), length n+1
    p = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(x)])
    # sum over (a, b] = P[b+1] - P[a+1]; a can be -1 (P[0] = 0)
    return p[ci[1:] + 1] - p[ci[:-1] + 1]


def range_count(ci: jnp.ndarray) -> jnp.ndarray:
    """Number of trades in each bar: ci[i+1] - ci[i]."""
    return jnp.diff(ci)


def _segment_reduce(x, bar_id, valid, n_bars, mode, fill):
    xm = jnp.where(valid, x, fill)
    if mode == "max":
        return jax.ops.segment_max(
            xm, bar_id, num_segments=n_bars, indices_are_sorted=True
        )
    return jax.ops.segment_min(
        xm, bar_id, num_segments=n_bars, indices_are_sorted=True
    )


def segment_max_ranges(x, bar_id, valid, n_bars):
    """Per-bar max; empty / fully-invalid bars yield -inf (caller overrides)."""
    return _segment_reduce(x, bar_id, valid, n_bars, "max", -jnp.inf)


def segment_min_ranges(x, bar_id, valid, n_bars):
    """Per-bar min; empty / fully-invalid bars yield +inf (caller overrides)."""
    return _segment_reduce(x, bar_id, valid, n_bars, "min", jnp.inf)


def _f32_sortable_bits(x32: jnp.ndarray) -> jnp.ndarray:
    """Map float32 -> uint32 preserving total order (IEEE-754 trick).

    For x >= 0 this is the raw bit pattern + sign-bit flip; for x < 0 the
    bits are inverted. NaNs sort above +inf.
    """
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    neg = bits >> 31 == 1
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def _f32_from_sortable_bits(key: jnp.ndarray) -> jnp.ndarray:
    pos = key >> 31 == 1
    bits = jnp.where(pos, key & jnp.uint32(0x7FFFFFFF), ~key)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


@partial(jax.jit, static_argnames=("n_bars",))
def sorted_segments(values_f32: jnp.ndarray, bar_id: jnp.ndarray, valid: jnp.ndarray,
                    n_bars: int) -> jnp.ndarray:
    """Sort float32 values within each bar using ONE int64-key sort.

    Packs ``(bar_id << 32) | order_preserving_bits(value)`` into int64 and
    sorts once; invalid trades get bar_id = n_bars and fall to the end.
    Returns the value array reordered so each bar's trades are contiguous
    (at offset ``ci[i] - ci[0]`` into the valid prefix) and ascending.
    """
    bid = jnp.where(valid, bar_id, n_bars).astype(jnp.uint64)
    key = (bid << 32) | _f32_sortable_bits(values_f32).astype(jnp.uint64)
    skey = jnp.sort(key.astype(jnp.int64)).astype(jnp.uint64)
    return _f32_from_sortable_bits((skey & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32))


def segment_median_pair(sorted_vals, offsets, counts):
    """The two middle values per bar from within-bar-sorted values.

    Returned separately so the f64 average (numpy median semantics) can
    happen host-side — device kernels avoid f64 arithmetic entirely on
    this TPU (see bar/aggregate_q.py).
    """
    c = counts
    lo = offsets + (jnp.maximum(c - 1, 0) >> 1)  # shifts: int64 div is slow on TPU
    hi = offsets + (jnp.maximum(c, 1) >> 1)
    n = sorted_vals.shape[0]
    a = sorted_vals[jnp.clip(lo, 0, n - 1)]
    b = sorted_vals[jnp.clip(hi, 0, n - 1)]
    return a, b


def segment_median_sorted(sorted_vals, offsets, counts):
    """Per-bar median from within-bar-sorted values (numpy median semantics:
    mean of the two middles for even counts). Zero-count bars return the
    value at the (clipped) offset — caller must mask them.
    """
    a, b = segment_median_pair(sorted_vals, offsets, counts)
    return (a.astype(jnp.float64) + b.astype(jnp.float64)) * 0.5


def segment_quantile_pair(sorted_vals, offsets, counts, q: float):
    """Bracketing values + integer position for a per-bar quantile.

    The f64 interpolation happens host-side (device kernels avoid f64
    arithmetic on this TPU). Positions use exact integer arithmetic:
    pos = q*(c-1) with q = qnum/qden rational.
    """
    from fractions import Fraction
    fr = Fraction(q).limit_denominator(10**6)
    qnum, qden = fr.numerator, fr.denominator
    c = counts
    cm1 = jnp.maximum(c, 1) - 1
    # int32 division (int64 division compiles pathologically on TPU);
    # exact while qnum*(c-1) < 2^31
    lo = ((cm1.astype(jnp.int32) * qnum) // qden).astype(cm1.dtype)
    n = sorted_vals.shape[0]
    a = sorted_vals[jnp.clip(offsets + lo, 0, n - 1)]
    b = sorted_vals[jnp.clip(offsets + jnp.minimum(lo + 1, cm1), 0, n - 1)]
    return a, b, lo


def segment_quantile_sorted(sorted_vals, offsets, counts, q: float):
    """Per-bar linear-interpolation quantile (numpy ``percentile`` default)
    from within-bar-sorted values. Parity with np.percentile(a, 100*q).
    """
    a, b, lo = segment_quantile_pair(sorted_vals, offsets, counts, q)
    pos = q * (jnp.maximum(counts, 1) - 1).astype(jnp.float64)
    frac = pos - lo.astype(jnp.float64)
    return a.astype(jnp.float64) * (1.0 - frac) + b.astype(jnp.float64) * frac

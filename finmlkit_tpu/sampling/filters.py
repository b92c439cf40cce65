"""Event sampling filters — TPU-native.

Parity: /root/reference/finmlkit/sampling/filters.py. The symmetric CUSUM
filter (AFML snippet 2.4) is a non-associative reset scan; like the CUSUM
bar indexer it is processed in vectorized chunks with the reset-scan
closed form, jumping from event to event (see
finmlkit_tpu.bar.indexers for the derivation).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK = 2048


@partial(jax.jit, static_argnames=("max_events", "chunk"))
def _cusum_events(rets: jnp.ndarray, thr: jnp.ndarray, max_events: int, chunk: int):
    n = rets.shape[0]
    rets_p = jnp.concatenate([rets, jnp.zeros((chunk,), rets.dtype)])
    thr_p = jnp.concatenate([thr, jnp.full((chunk,), jnp.inf, thr.dtype)])

    def cond(state):
        pos, _, _, k, _ = state
        return (pos < n) & (k < max_events)

    def body(state):
        pos, sp0, sn0, k, out = state
        r = jax.lax.dynamic_slice(rets_p, (pos,), (chunk,))
        t = jax.lax.dynamic_slice(thr_p, (pos,), (chunk,))
        big = jnp.cumsum(r)
        s_pos = jnp.maximum(sp0 + big, big - jax.lax.cummin(big))
        s_neg = jnp.minimum(sn0 + big, big - jax.lax.cummax(big))
        in_range = pos + jnp.arange(chunk, dtype=jnp.int64) < n
        neg_hit = s_neg < -t           # strict; checked first (filters.py:61)
        pos_hit = s_pos > t            # strict
        ev = in_range & (neg_hit | pos_hit)
        has_ev = jnp.any(ev)
        e = jnp.argmax(ev).astype(jnp.int64)
        ev_idx = pos + e

        trig_neg = neg_hit[e]          # s_neg precedence on double trigger
        zero = jnp.zeros((), rets.dtype)
        new_sp = jnp.where(trig_neg, s_pos[e], zero)
        new_sn = jnp.where(trig_neg, zero, s_neg[e])

        last = jnp.minimum(n - 1 - pos, chunk - 1)
        carry_sp, carry_sn = s_pos[last], s_neg[last]

        out = out.at[k].set(jnp.where(has_ev, ev_idx, out[k]))
        return (jnp.where(has_ev, ev_idx + 1, pos + chunk),
                jnp.where(has_ev, new_sp, carry_sp),
                jnp.where(has_ev, new_sn, carry_sn),
                k + jnp.where(has_ev, 1, 0),
                out)

    out = jnp.zeros((max_events,), jnp.int64)
    zero = jnp.zeros((), rets.dtype)
    init = (jnp.int64(1), zero, zero, jnp.int64(0), out)
    _, _, _, k, out = jax.lax.while_loop(cond, body, init)
    return out, k


def cusum_filter(raw_time_series, threshold, max_events: int | None = None,
                 dtype=None):
    """Symmetric CUSUM event filter on log returns.

    Parity: /root/reference/finmlkit/sampling/filters.py:6-70 — strict
    threshold comparisons, s_neg checked before s_pos, only the triggered
    side resets; threshold is a scalar (1-element array) or per-sample
    vector. Returns int64 event indices into ``raw_time_series``.

    ``dtype`` selects the scan precision: float64 (default, exact parity
    with the reference) or float32 (TPU fast path — f64 scan kernels
    compile pathologically slowly on TPU; float32 keeps ~1e-7 relative
    precision on log returns, so events at exact threshold boundaries may
    differ in rare cases).
    """
    x = np.asarray(raw_time_series, dtype=np.float64)
    thr = np.asarray(threshold, dtype=np.float64)
    if len(x) <= 1:
        raise ValueError("Input time series must have at least 2 elements.")
    if len(thr) != 1 and len(thr) != len(x):
        raise ValueError(
            "Threshold array must either contain 1 const. element or len(raw_time_series) elements.")
    n = len(x)
    if len(thr) == 1:
        thr = np.full(n, thr[0])

    # native host path: the event loop is an inherently sequential,
    # branchy scan over a small series — C machine code runs it in
    # microseconds (exact f64 reference semantics), vs thousands of
    # device round-trips for the event-jump while_loop below
    from .. import native
    log_ret = np.empty(n, np.float64)
    log_ret[0] = 0.0
    np.log(x[1:] / x[:-1], out=log_ret[1:])
    # (max_events is a buffer-size hint for the device scan below, not a
    # truncation cap — the native path always returns every event)
    ev = native.cusum_filter_events(log_ret, thr)
    if ev is not None:
        return ev

    dt = jnp.float64 if dtype is None else jnp.dtype(dtype)
    xs = jnp.asarray(x, dt)
    rets = jnp.concatenate([jnp.full((1,), jnp.nan, dt),
                            jnp.log(xs[1:] / xs[:-1])])
    thr = thr.astype(dt)
    mb = int(max_events) if max_events is not None else max(min(n, 1 << 20), 2)
    while True:
        out, k = _cusum_events(rets, jnp.asarray(thr), mb, _CHUNK)
        count = int(k)
        if count < mb or mb >= n:
            break
        mb = min(mb * 4, n)
    return np.asarray(out[:count])


@partial(jax.jit, static_argnames=("window",))
def _z_peak_mask(y: jnp.ndarray, window: int, threshold):
    n = y.shape[0]
    c = jnp.concatenate([jnp.zeros((1,), y.dtype), jnp.cumsum(y)])
    c2 = jnp.concatenate([jnp.zeros((1,), y.dtype), jnp.cumsum(y * y)])
    # trailing window ending at i-1: sum over [i-window, i)
    i = jnp.arange(n)
    s = c[i] - c[jnp.maximum(i - window, 0)]
    s2 = c2[i] - c2[jnp.maximum(i - window, 0)]
    w = jnp.asarray(window, y.dtype)
    mean = s / w
    var = jnp.maximum(s2 / w - mean * mean, 0.0)
    std = jnp.sqrt(var)
    thr = jnp.asarray(threshold, y.dtype)
    return (i >= window) & (jnp.abs(y - mean) > thr * std) & (std > 0.0)


def z_score_peak_filter(y, window: int, threshold: float = 3, dtype=None):
    """Real-time z-score peak detection filter.

    The reference declares this and raises NotImplementedError
    (/root/reference/finmlkit/sampling/filters.py:73-94, citing the
    classic "smoothed z-score" StackOverflow algorithm) — implemented
    here, exceeding the reference. Semantics (the causal variant that
    vectorizes to one cumsum pass, i.e. influence = 1 in the cited
    algorithm's terms): index ``i`` is an event iff

        |y[i] - mean(y[i-window:i])| > threshold * std(y[i-window:i])

    with mean/std over the trailing ``window`` observations *before*
    ``i`` (population std). Flat windows (std == 0) never signal.

    :param y: input series, length >= window + 2.
    :param window: trailing observations used for mean/std.
    :param threshold: z-score threshold.
    :param dtype: kernel precision — float64 (default; CPU parity) or
        float32 (TPU fast path, same convention as :func:`cusum_filter`;
        the series is mean-centered first so the f32 cumsums stay
        well-conditioned).
    :returns: int64 indices of detected peaks.
    """
    dt = np.float64 if dtype is None else np.dtype(dtype)
    y = np.asarray(y, dtype=np.float64)
    if window < 1:
        raise ValueError("window must be >= 1")
    if y.shape[0] < window + 2:
        raise ValueError("y must have at least window + 2 observations")
    yc = (y - y.mean()).astype(dt)  # centering: z-scores are shift-invariant
    mask = np.asarray(_z_peak_mask(jnp.asarray(yc), int(window), float(threshold)))
    return np.nonzero(mask)[0].astype(np.int64)

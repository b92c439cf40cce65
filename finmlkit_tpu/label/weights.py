"""AFML ch. 4 sample weights — TPU-native.

Parity: /root/reference/finmlkit/label/weights.py. The reference's
sequential interval increments and per-event window loops become:

- concurrency: +1/-1 difference array scatter + cumsum (weights.py:35-38)
- average uniqueness / return attribution: per-event window sums as
  prefix-sum differences (gathers), replacing prange loops
  (weights.py:41-47, :85-94)
- time decay / class balance: closed-form vector ops
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# On TPU, plain ``jnp.cumsum`` over the trade axis compiles
# pathologically (minutes; BENCH_NOTES.md) and f64 planes are emulated —
# the TPU paths below use the Pallas chunked scan (fast_cumsum as a
# TOP-LEVEL call: a Pallas kernel nested in a jit hangs the compiler)
# with f64 quantities in 2^32 fixed point (int64-pair-exact scan;
# quantization error <= 2^-32 per element, i.e. ~1e-10 absolute on the
# final weights — the CPU path stays bit-exact f64).
_FIX_BITS = 32
_FIX = float(1 << _FIX_BITS)


@partial(jax.jit, static_argnames=("n",))
def _conc_inc(event_idxs, touch_idxs, n: int):
    inc = jnp.zeros((n + 1,), jnp.int32)
    inc = inc.at[event_idxs].add(1)
    inc = inc.at[touch_idxs + 1].add(-1)
    return inc


def _concurrency(event_idxs, touch_idxs, n: int):
    from ..ops.pallas_scan import fast_cumsum

    inc = _conc_inc(event_idxs, touch_idxs, n)
    return fast_cumsum(inc)[:-1].astype(jnp.int16)


@jax.jit
def _inv_fixed(conc):
    """floor(2^32 / conc) exactly, without integer division: an f32
    reciprocal estimate (error <= ~512 for small conc), one f32 Newton
    residual step (error <= ~2), then an exact integer correction."""
    c64 = jnp.maximum(conc, 1).astype(jnp.int64)
    cf = c64.astype(jnp.float32)
    big = jnp.int64(1) << _FIX_BITS
    q = (jnp.float32(_FIX) / cf).astype(jnp.int64)
    r = big - q * c64
    q = q + (r.astype(jnp.float32) / cf).astype(jnp.int64)
    q = q - (q * c64 > big) - (q * c64 > big)
    q = q + ((q + 1) * c64 <= big) + ((q + 1) * c64 <= big)
    return jnp.where(conc > 0, q, 0)


@jax.jit
def _window_mean_post(event_idxs, touch_idxs, p_q):
    s = (p_q[touch_idxs + 1] - p_q[event_idxs]).astype(jnp.float64) / _FIX
    cnt = (touch_idxs - event_idxs + 1).astype(jnp.float64)
    return s / cnt


@jax.jit
def _window_mean_inv_f64(event_idxs, touch_idxs, conc):
    inv = jnp.where(conc > 0, 1.0 / conc.astype(jnp.float64), 0.0)
    p = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(inv)])
    s = p[touch_idxs + 1] - p[event_idxs]
    cnt = (touch_idxs - event_idxs + 1).astype(jnp.float64)
    return s / cnt


def _window_mean_inv(event_idxs, touch_idxs, conc):
    from ..ops.pallas_scan import _runs_on_tpu, fast_cumsum

    if not _runs_on_tpu(conc):
        return _window_mean_inv_f64(event_idxs, touch_idxs, conc)
    q = _inv_fixed(conc)
    p_q = jnp.concatenate([jnp.zeros((1,), jnp.int64), fast_cumsum(q)])
    return _window_mean_post(event_idxs, touch_idxs, p_q)


def average_uniqueness(timestamps, event_idxs, touch_idxs):
    """Uniqueness weights + concurrency (AFML ch.4 p.61).

    Parity: weights.py:7-49. Returns (weights f64 per event,
    concurrency i16 per timestamp).
    """
    if len(event_idxs) != len(touch_idxs):
        raise ValueError("Timestamps and lookahead indices must have the same length.")
    n = len(timestamps)
    ev = jnp.asarray(event_idxs, jnp.int64)
    tch = jnp.asarray(touch_idxs, jnp.int64)
    conc = _concurrency(ev, tch, n)
    w = _window_mean_inv(ev, tch, conc)
    return w, conc


@jax.jit
def _return_attr(event_idxs, touch_idxs, close, conc):
    n = close.shape[0]
    log_rets = jnp.concatenate([
        jnp.full((1,), jnp.nan, jnp.float64),
        jnp.where(close[:-1] != 0.0, jnp.log(close[1:] / close[:-1]), jnp.nan),
    ])
    contrib = jnp.where((conc > 0) & ~jnp.isnan(log_rets),
                        log_rets / jnp.maximum(conc, 1).astype(jnp.float64), 0.0)
    p = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(contrib)])
    return jnp.abs(p[touch_idxs + 1] - p[event_idxs])


@jax.jit
def _return_attr_contrib_q(close, conc):
    """Per-trade attribution contributions in 2^32 fixed point, f32
    arithmetic (TPU fast path: f64 planes are emulated and plain cumsum
    compiles pathologically there; |log1p| error ~1e-7 relative)."""
    c32 = close.astype(jnp.float32)
    rel = jnp.where(c32[:-1] != 0.0, (c32[1:] - c32[:-1]) / c32[:-1],
                    jnp.nan)
    log_rets = jnp.concatenate([
        jnp.full((1,), jnp.nan, jnp.float32), jnp.log1p(rel)])
    contrib = jnp.where((conc > 0) & ~jnp.isnan(log_rets),
                        log_rets
                        / jnp.maximum(conc, 1).astype(jnp.float32), 0.0)
    return (contrib * jnp.float32(_FIX)).astype(jnp.int64)


@jax.jit
def _return_attr_post(event_idxs, touch_idxs, p_q):
    return jnp.abs((p_q[touch_idxs + 1]
                    - p_q[event_idxs]).astype(jnp.float64) / _FIX)


def return_attribution(event_idxs, touch_idxs, close, concurrency,
                       normalize: bool = True):
    """Return-attribution weights (AFML ch.4 p.68). Parity: weights.py:52-103.

    On TPU the per-trade prefix runs as the Pallas pair scan over 2^32
    fixed-point f32 contributions (exact f64 planes/cumsum are
    pathological there); off-TPU the exact f64 path is used.
    """
    from ..ops.pallas_scan import _runs_on_tpu, fast_cumsum

    ev = jnp.asarray(event_idxs, jnp.int64)
    tch = jnp.asarray(touch_idxs, jnp.int64)
    conc_j = jnp.asarray(concurrency)
    if _runs_on_tpu(conc_j):
        q = _return_attr_contrib_q(jnp.asarray(close), conc_j)
        p_q = jnp.concatenate([jnp.zeros((1,), jnp.int64),
                               fast_cumsum(q)])
        w = _return_attr_post(ev, tch, p_q)
    else:
        w = _return_attr(ev, tch, jnp.asarray(close, jnp.float64),
                         conc_j)
    if normalize:
        s = float(jnp.sum(w))
        if s <= 0.0:
            raise ValueError("Sum of weights is zero or negative, cannot normalize.")
        w = w * (len(event_idxs) / s)
    return w


def time_decay(avg_uniqueness, last_weight: float):
    """Linear time decay over cumulative uniqueness (AFML ch.4 p.70).

    Parity: weights.py:106-142. ``last_weight`` in [-1, 1]; negative
    values truncate the oldest portion to zero.
    """
    if not -1.0 <= last_weight <= 1.0:
        raise ValueError("last_weight must lie in [-1, 1]")
    u = jnp.asarray(avg_uniqueness, jnp.float64)
    cum = jnp.cumsum(u)
    total = cum[-1]
    if float(total) == 0.0:
        raise ValueError("The sum of all average uniqueness weights must be greater than 0.")
    if last_weight >= 0.0:
        slope = (1.0 - last_weight) / total
    else:
        slope = 1.0 / ((last_weight + 1.0) * total)
    const = 1.0 - slope * total
    w = const + slope * cum
    if last_weight < 0.0:
        w = jnp.maximum(w, 0.0)
    return w


def class_balance_weights(labels, base_w):
    """Class-balance multipliers from weighted class counts.

    Parity: weights.py:146-188. Returns (unique_labels, class_weights,
    sum_w_class, final_weights).
    """
    labels = np.asarray(labels)
    base = jnp.asarray(base_w, jnp.float64)
    uniq = np.unique(labels)
    n_classes = len(uniq)
    label_idx = jnp.asarray(np.searchsorted(uniq, labels))
    sum_w_class = jax.ops.segment_sum(base, label_idx, num_segments=n_classes)
    total = jnp.sum(sum_w_class)
    class_w = jnp.where(sum_w_class > 0.0,
                        total / (n_classes * jnp.where(sum_w_class > 0, sum_w_class, 1.0)),
                        0.0)
    final = base * class_w[label_idx]
    return uniq, class_w, sum_w_class, final

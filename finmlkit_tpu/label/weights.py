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


@partial(jax.jit, static_argnames=("n",))
def _concurrency(event_idxs, touch_idxs, n: int):
    inc = jnp.zeros((n + 1,), jnp.int32)
    inc = inc.at[event_idxs].add(1)
    inc = inc.at[touch_idxs + 1].add(-1)
    return jnp.cumsum(inc)[:-1].astype(jnp.int16)


@jax.jit
def _window_mean_inv(event_idxs, touch_idxs, conc):
    inv = jnp.where(conc > 0, 1.0 / conc.astype(jnp.float64), 0.0)
    p = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(inv)])
    s = p[touch_idxs + 1] - p[event_idxs]
    cnt = (touch_idxs - event_idxs + 1).astype(jnp.float64)
    return s / cnt


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


def return_attribution(event_idxs, touch_idxs, close, concurrency,
                       normalize: bool = True):
    """Return-attribution weights (AFML ch.4 p.68). Parity: weights.py:52-103."""
    ev = jnp.asarray(event_idxs, jnp.int64)
    tch = jnp.asarray(touch_idxs, jnp.int64)
    w = _return_attr(ev, tch, jnp.asarray(close, jnp.float64),
                     jnp.asarray(concurrency))
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

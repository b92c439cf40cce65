"""Triple-Barrier Method labeling (AFML ch. 3) — TPU-native.

Parity: /root/reference/finmlkit/label/tbm.py:11-158. The reference walks
each event's price path sequentially under a ``prange``; here the path
search is a *chunked* scan vmapped over events: each step evaluates a
vector of CHUNK consecutive trades (returns, barrier ratios, touch tests)
and early-exits via the loop predicate once every event found its touch.
Work is O(sum of path lengths) in CHUNK-sized vector ops — the natural
TPU shape for a data-dependent path search.

Semantics preserved exactly:
- vertical barrier index via searchsorted(right)-1 on ns timestamps
- ``min_close_time``: trades closer than this to the event cannot close
  it (the active path is a suffix because duration is monotone)
- side-multiplied returns for meta-labeling; labels are sign(ret) with
  0 -> +1 in side mode, ``ret >= min_ret`` in meta mode
- ``max_rb_ratios``: how close the path came to a horizontal barrier
  when the vertical barrier was hit (1.0 on horizontal touch, NaN when
  the relevant barrier is disabled); events whose vertical barrier does
  not fit are skipped (label 0, NaN ret/ratio)
"""
from functools import partial

import jax
import jax.numpy as jnp

_CHUNK = 256


@partial(jax.jit, static_argnames=("is_meta", "chunk"))
def _tbm_search(log_close, timestamps, event_idxs, t1_idxs, targets,
                bottom_mult, top_mult, min_close_time_ns, side, min_ret,
                is_meta: bool, chunk: int):
    n = log_close.shape[0]

    def one_event(t0_idx, t1_idx, tgt, side_mult):
        upper = tgt * top_mult
        lower = -tgt * bottom_mult
        upper_valid = jnp.isfinite(upper) & (upper != 0.0)
        lower_valid = jnp.isfinite(lower) & (lower != 0.0)
        t0 = timestamps[t0_idx]
        base = log_close[t0_idx]

        def cond(state):
            pos, done, *_ = state
            return (~done) & (pos <= t1_idx)

        def body(state):
            pos, done, touch, mu, ml = state
            j = pos + jnp.arange(chunk, dtype=jnp.int64)
            jc = jnp.minimum(j, n - 1)
            lc = log_close[jc]
            ts = timestamps[jc]
            dur = ts - t0
            active = (j <= t1_idx) & (dur >= min_close_time_ns)
            ret = (lc - base) * side_mult

            hit = active & ((ret >= upper) | (ret <= lower))
            any_hit = jnp.any(hit)
            ft = jnp.argmax(hit).astype(jnp.int64)  # first hit offset
            # positions at or before the first hit (all if no hit)
            upto = jnp.where(any_hit,
                             jnp.arange(chunk, dtype=jnp.int64) <= ft,
                             jnp.ones((chunk,), jnp.bool_))
            consider = active & upto
            urbr = jnp.where(consider & (ret > 0.0) & upper_valid,
                             ret / upper, 0.0)
            lrbr = jnp.where(consider & (ret < 0.0) & lower_valid,
                             ret / lower, 0.0)
            mu = jnp.maximum(mu, jnp.max(urbr))
            ml = jnp.maximum(ml, jnp.max(lrbr))
            touch = jnp.where(any_hit, j[ft], touch)
            return (pos + chunk, done | any_hit, touch, mu, ml)

        init = (t0_idx + 1, t1_idx <= t0_idx, t1_idx,
                jnp.float64(0.0), jnp.float64(0.0))
        _, _, touch, mu, ml = jax.lax.while_loop(cond, body, init)

        # final return: the last processed path point is the touch itself;
        # if even the vertical barrier is inside min_close_time the whole
        # path was skipped and ret stays 0 (reference tbm.py:108-116)
        touch_active = (timestamps[touch] - t0) >= min_close_time_ns
        ret = jnp.where(touch_active & (t1_idx > t0_idx),
                        (log_close[touch] - base) * side_mult, 0.0)

        if is_meta:
            label = jnp.where(ret >= min_ret, 1, 0).astype(jnp.int8)
        else:
            sgn = jnp.sign(ret)
            label = jnp.where(sgn == 0, 1, sgn).astype(jnp.int8)

        vertical = touch == t1_idx
        pos_ratio = jnp.where(upper_valid, mu / (1.0 + ml), jnp.nan)
        neg_ratio = jnp.where(lower_valid, ml / (1.0 + mu), jnp.nan)
        rbr = jnp.where(ret > 0.0, pos_ratio, neg_ratio)
        max_rbr = jnp.where(vertical, jnp.minimum(rbr, 1.0), 1.0)

        skipped = t1_idx <= t0_idx
        label = jnp.where(skipped, 0, label)
        ret = jnp.where(skipped, jnp.nan, ret)
        max_rbr = jnp.where(skipped, jnp.nan, max_rbr)
        touch = jnp.where(skipped, t0_idx, touch)
        return label, touch, ret, max_rbr

    return jax.vmap(one_event)(event_idxs, t1_idxs, targets, side)


def triple_barrier(timestamps, close, event_idxs, targets,
                   horizontal_barriers, vertical_barrier,
                   min_close_time_sec=0.0, side=None, min_ret=0.0,
                   chunk: int = _CHUNK):
    """Label events with the Triple-Barrier Method.

    Parity: /root/reference/finmlkit/label/tbm.py:11-158 (see module
    docstring). Returns (labels i8, touch_idxs i64, rets f64,
    max_rb_ratios f64).
    """
    if vertical_barrier <= 0:
        raise ValueError("The vertical barrier must be greater than zero.")
    if min_ret < 0:
        raise ValueError("The minimum return must be non-negative.")
    if len(timestamps) != len(close):
        raise ValueError("The lengths of timestamps and close must match.")
    if len(event_idxs) != len(targets):
        raise ValueError("The lengths of event_idxs and targets must match.")
    if len(event_idxs) == 0:
        raise ValueError("The event_idxs array must not be empty.")
    is_meta = side is not None
    if is_meta and len(event_idxs) != len(side):
        raise ValueError("The length of event_idxs must match the length of side.")

    timestamps = jnp.asarray(timestamps, dtype=jnp.int64)
    close = jnp.asarray(close, dtype=jnp.float64)
    event_idxs = jnp.asarray(event_idxs, dtype=jnp.int64)
    targets = jnp.asarray(targets, dtype=jnp.float64)
    bottom_mult, top_mult = horizontal_barriers
    if side is None:
        side_arr = jnp.ones_like(event_idxs, dtype=jnp.float64)
    else:
        side_arr = jnp.asarray(side, dtype=jnp.float64)

    log_close = jnp.log(close)
    vb_ns = float(vertical_barrier) * 1e9
    t0 = timestamps[event_idxs]
    t1_target = (t0.astype(jnp.float64) + vb_ns)
    # inf vertical barrier -> clamp to last trade
    t1_clamped = jnp.where(jnp.isfinite(t1_target), t1_target, jnp.inf)
    t1_idxs = jnp.searchsorted(
        timestamps, jnp.where(jnp.isfinite(t1_clamped),
                              t1_clamped, jnp.float64(jnp.iinfo(jnp.int64).max)).astype(jnp.int64),
        side="right").astype(jnp.int64) - 1

    return _tbm_search(
        log_close, timestamps, event_idxs, t1_idxs, targets,
        jnp.float64(bottom_mult), jnp.float64(top_mult),
        jnp.float64(float(min_close_time_sec) * 1e9), side_arr,
        jnp.float64(min_ret), is_meta, int(chunk))

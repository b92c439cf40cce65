"""Scan primitives: associative linear recurrences and shape bucketing.

The reference's sequential Numba loops fall into two families:

1. First-order linear recurrences ``y_t = a_t * y_{t-1} + b_t`` (EWMA /
   EWM-std / Wilder RSI / ATR — e.g. /root/reference/finmlkit/feature/core/
   ma.py:6-43). These are associative under the composition
   ``(a1,b1) ∘ (a2,b2) = (a1*a2, b1*a2 + b2)`` and map to
   ``jax.lax.associative_scan`` (log-depth on the VPU).

2. Threshold-reset scans (volume/dollar/CUSUM bar indexers, CUSUM filter).
   Those are handled by event-jump searches in ``bar.indexers`` /
   ``sampling.filters``, not here.
"""
from functools import partial

import jax
import jax.numpy as jnp


def linear_recurrence(a: jnp.ndarray, b: jnp.ndarray, y0=None) -> jnp.ndarray:
    """Compute ``y_t = a_t * y_{t-1} + b_t`` for all t via associative scan.

    ``y_{-1} = y0`` (default 0). Shapes of a and b must match; scan runs
    along axis 0.
    """
    if y0 is not None:
        b = b.at[0].add(a[0] * y0)

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, b1 * a2 + b2

    _, y = jax.lax.associative_scan(combine, (a, b))
    return y


@partial(jax.jit, static_argnames=("bucket",))
def _pad_impl(x, fill, bucket):
    n = x.shape[0]
    return jnp.concatenate([x, jnp.full((bucket - n,) + x.shape[1:], fill, x.dtype)])


def next_bucket(n: int, min_bucket: int = 1024) -> int:
    """Round n up to the next power-of-two-ish bucket to bound recompiles."""
    b = min_bucket
    while b < n:
        b *= 2
    return b


def padded_to_bucket(x, fill, min_bucket: int = 1024):
    """Pad array to the next bucket size along axis 0. Returns (padded, n)."""
    n = int(x.shape[0])
    b = next_bucket(n, min_bucket)
    if b == n:
        return x, n
    return _pad_impl(x, fill, b), n

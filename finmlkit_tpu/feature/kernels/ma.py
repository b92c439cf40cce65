"""Moving averages.

Parity: /root/reference/finmlkit/feature/core/ma.py.
"""
from functools import partial

import jax
import jax.numpy as jnp

from ...config import feature_dtype as _fdt

from ...ops.scan import linear_recurrence
from ._rolling import roll_sum, warmup_nan


@partial(jax.jit, static_argnames=("span",))
def _ewma_impl(y, span: int):
    alpha = 2.0 / (span + 1.0)
    a = jnp.full_like(y, 1.0 - alpha)
    u = linear_recurrence(a, y)
    # v_t = 1 + (1-alpha) v_{t-1}, v_0 = 1  ->  closed form geometric sum
    t = jnp.arange(y.shape[0], dtype=y.dtype)
    v = (1.0 - (1.0 - alpha) ** (t + 1.0)) / alpha
    return u / v


def ewma(y, span: int):
    """pandas ``ewm(span).mean()`` with adjust=True via associative scan.

    Parity: core/ma.py:6-43 (u/v recurrences; the denominator has a
    closed geometric form). NaNs poison all subsequent values, as in the
    sequential recurrence.
    """
    if span < 1:
        raise ValueError("span size is less than or equal to 1. Please provide a span size greater than 1.")
    return _ewma_impl(jnp.asarray(y, _fdt()), int(span))


@partial(jax.jit, static_argnames=("window",))
def _sma_impl(y, window: int):
    return warmup_nan(roll_sum(y, window) / window, window)


def sma(array, window: int):
    """Rolling mean; NaN for the first window-1 points.

    Parity: core/ma.py:46-62 (windowed sums, so a NaN only affects
    windows containing it).
    """
    return _sma_impl(jnp.asarray(array, _fdt()), int(window))

"""Trend indicators (ADX).

Parity: /root/reference/finmlkit/feature/core/trend.py:8-96 — TR/±DM,
Wilder running smoothing (a leaky integrator ``s_t = (1-1/L) s_{t-1} +
x_t``, a linear recurrence), DI/DX, and the final ADX Wilder average.
"""
from functools import partial

import jax
import jax.numpy as jnp

from ...config import feature_dtype as _fdt

from ...ops.scan import linear_recurrence


@partial(jax.jit, static_argnames=("length",))
def _adx_impl(high, low, close, length: int):
    n = high.shape[0]
    pc = close[:-1]
    tr = jnp.maximum(high[1:] - low[1:],
                     jnp.maximum(jnp.abs(high[1:] - pc), jnp.abs(low[1:] - pc)))
    hd = high[1:] - high[:-1]
    ld = low[:-1] - low[1:]
    plus_dm = jnp.where((hd > ld) & (hd > 0), hd, 0.0)
    minus_dm = jnp.where((ld > hd) & (ld > 0), ld, 0.0)
    # prepend zeros for index 0
    z = jnp.zeros((1,), jnp.float64)
    tr = jnp.concatenate([z, tr])
    plus_dm = jnp.concatenate([z, plus_dm])
    minus_dm = jnp.concatenate([z, minus_dm])

    def wilder_sum(x):
        """s_L = sum(x[1:L+1]); s_t = s_{t-1}(1-1/L) + x_t for t > L."""
        seed = jnp.sum(x[1:length + 1])
        tail = x[length + 1:]
        if tail.shape[0] > 0:
            a = jnp.full_like(tail, 1.0 - 1.0 / length)
            rest = linear_recurrence(a, tail, y0=seed)
        else:
            rest = tail
        return jnp.concatenate([jnp.zeros((length,), jnp.float64),
                                seed[None], rest])

    s_tr = wilder_sum(tr)
    s_pdm = wilder_sum(plus_dm)
    s_mdm = wilder_sum(minus_dm)

    idx = jnp.arange(n)
    valid = (idx >= length) & (s_tr > 0)
    plus_di = jnp.where(valid, 100.0 * s_pdm / jnp.where(s_tr > 0, s_tr, 1.0), 0.0)
    minus_di = jnp.where(valid, 100.0 * s_mdm / jnp.where(s_tr > 0, s_tr, 1.0), 0.0)
    di_sum = plus_di + minus_di
    dx = jnp.where((idx >= length) & (di_sum > 0),
                   100.0 * jnp.abs(plus_di - minus_di) / jnp.where(di_sum > 0, di_sum, 1.0),
                   0.0)

    adx = jnp.zeros(n, jnp.float64)
    if n >= 2 * length:
        seed = jnp.mean(dx[length:2 * length])
        tail = dx[2 * length:]
        if tail.shape[0] > 0:
            a = jnp.full_like(tail, (length - 1.0) / length)
            rest = linear_recurrence(a, tail / length, y0=seed)
        else:
            rest = tail
        adx = jnp.concatenate([jnp.zeros((2 * length - 1,), jnp.float64),
                               seed[None], rest])
    return adx


def adx(high, low, close, length: int):
    """Average Directional Index. Parity: core/trend.py:8-96."""
    high = jnp.asarray(high, _fdt())
    if high.shape[0] < length + 1:
        return jnp.zeros_like(high)
    return _adx_impl(high, jnp.asarray(low, _fdt()),
                     jnp.asarray(close, _fdt()), int(length))

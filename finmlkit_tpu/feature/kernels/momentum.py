"""Momentum indicators.

Parity: /root/reference/finmlkit/feature/core/momentum.py.
"""
from functools import partial

import jax
import jax.numpy as jnp

from ...config import feature_dtype as _fdt

from ...ops.scan import linear_recurrence
from ._rolling import roll_max, roll_min, warmup_nan


@partial(jax.jit, static_argnames=("period",))
def _roc_impl(price, period: int):
    lag = jnp.roll(price, period)
    out = (price - lag) / lag * 100.0
    idx = jnp.arange(price.shape[0])
    return jnp.where(idx < period, jnp.nan, out)


def roc(price, period: int):
    """Rate of change (%). Parity: core/momentum.py:6-22."""
    return _roc_impl(jnp.asarray(price, _fdt()), int(period))


@partial(jax.jit, static_argnames=("window",))
def _rsi_impl(close, window: int):
    n = close.shape[0]
    diff = jnp.diff(close)
    gain = jnp.maximum(diff, 0.0)
    loss = jnp.maximum(-diff, 0.0)
    seed_gain = jnp.sum(gain[:window]) / window
    seed_loss = jnp.sum(loss[:window]) / window

    # Wilder smoothing: avg_t = ((w-1) avg_{t-1} + x_t)/w from index window
    tail_g = gain[window:]
    tail_l = loss[window:]
    if tail_g.shape[0] > 0:
        a = jnp.full_like(tail_g, (window - 1.0) / window)
        avg_gain = jnp.concatenate([
            seed_gain[None], linear_recurrence(a, tail_g / window, y0=seed_gain)])
        avg_loss = jnp.concatenate([
            seed_loss[None], linear_recurrence(a, tail_l / window, y0=seed_loss)])
    else:
        avg_gain, avg_loss = seed_gain[None], seed_loss[None]

    rsi = 100.0 - 100.0 / (1.0 + avg_gain / avg_loss)
    rsi = jnp.where(avg_loss > 0.0, rsi, jnp.nan)
    return jnp.concatenate([jnp.full((window,), jnp.nan), rsi])


def rsi_wilder(close, window: int):
    """Wilder-smoothed RSI via linear recurrence. Parity: core/momentum.py:25-65."""
    close = jnp.asarray(close, _fdt())
    if close.shape[0] <= window:
        return jnp.full_like(close, jnp.nan)
    return _rsi_impl(close, int(window))


@partial(jax.jit, static_argnames=("length",))
def _stoch_impl(close, low, high, length: int):
    lo = roll_min(low, length)
    hi = roll_max(high, length)
    out = jnp.where(hi > lo, 100.0 * (close - lo) / (hi - lo), jnp.nan)
    return warmup_nan(out, length)


def stoch_k(close, low, high, length: int):
    """Stochastic %K via rolling min/max. Parity: core/momentum.py:68-111."""
    close = jnp.asarray(close, _fdt())
    if close.shape[0] < length:
        return jnp.full_like(close, jnp.nan)
    return _stoch_impl(close, jnp.asarray(low, _fdt()),
                       jnp.asarray(high, _fdt()), int(length))

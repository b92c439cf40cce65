"""General-purpose kernels: lagged returns, z-score, burst ratio, pct change.

Parity: /root/reference/finmlkit/feature/core/utils.py.
"""
from functools import partial

import jax
import jax.numpy as jnp

from ...config import feature_dtype as _fdt

from ._rolling import roll_sum, sliding_windows, warmup_nan


@partial(jax.jit, static_argnames=("is_log",))
def _lagged_returns_impl(timestamps, close, ret_window_ns, is_log: bool):
    n = close.shape[0]
    target = timestamps.astype(jnp.float64) - ret_window_ns
    lag_idx = jnp.searchsorted(timestamps.astype(jnp.float64), target,
                               side="right").astype(jnp.int64) - 1
    idx = jnp.arange(n)
    ok = (lag_idx >= 0) & (lag_idx < idx)
    base = close[jnp.clip(lag_idx, 0, n - 1)]
    if is_log:
        ret = jnp.log(close / jnp.where(base != 0.0, base, 1.0))
    else:
        ret = close / jnp.where(base != 0.0, base, 1.0) - 1.0
    ret = jnp.where(base != 0.0, ret, jnp.inf)
    ret = jnp.where(ok, ret, jnp.nan)
    # warm-up: indices before the first fully-contained window stay NaN
    start = jnp.searchsorted(timestamps.astype(jnp.float64),
                             timestamps[0].astype(jnp.float64) + ret_window_ns,
                             side="left")
    return jnp.where(idx >= start, ret, jnp.nan)


def comp_lagged_returns(timestamps, close, return_window_sec, is_log: bool):
    """Time-window returns on irregular series via searchsorted gather.

    Parity: core/utils.py:12-64.
    """
    if return_window_sec <= 0:
        raise ValueError("The return window must be greater than zero.")
    return _lagged_returns_impl(jnp.asarray(timestamps, jnp.int64),
                                jnp.asarray(close, _fdt()),
                                jnp.float64(return_window_sec * 1e9),
                                bool(is_log))


@partial(jax.jit, static_argnames=("window", "ddof"))
def _zscore_impl(x, window: int, ddof: int):
    s = roll_sum(x, window)
    s2 = roll_sum(x * x, window)
    mean = s / window
    var = (s2 - window * mean * mean) / (window - ddof)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    out = jnp.where(std != 0.0, (x - mean) / std, jnp.nan)
    return warmup_nan(out, window)


def comp_zscore(x, window: int, ddof: int = 0):
    """Rolling z-score. Parity: core/utils.py:67-90."""
    return _zscore_impl(jnp.asarray(x, _fdt()), int(window), int(ddof))


@partial(jax.jit, static_argnames=("window",))
def _burst_impl(series, window: int):
    w = sliding_windows(series, window)
    med = jnp.median(w, axis=1)
    out = jnp.where(med > 0, series / med, jnp.nan)
    return warmup_nan(out, window)


def comp_burst_ratio(series, window: int):
    """x / rolling median. Parity: core/utils.py:92-108.

    The rolling median is computed on materialized (n, window) trailing
    windows — O(n*window) memory, fine for bar-level series.
    """
    return _burst_impl(jnp.asarray(series, _fdt()), int(window))


@partial(jax.jit, static_argnames=("periods",))
def _pct_change_impl(x, periods: int):
    base = jnp.roll(x, periods)
    out = jnp.where(base > 0, (x - base) / jnp.where(base > 0, base, 1.0), jnp.nan)
    idx = jnp.arange(x.shape[0])
    return jnp.where(idx < periods, jnp.nan, out)


def pct_change(x, periods: int):
    """Lagged percent change (NaN when base <= 0). Parity: core/utils.py:110-124."""
    return _pct_change_impl(jnp.asarray(x, _fdt()), int(periods))

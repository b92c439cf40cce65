"""Mean-reversion features (VWAP distance).

Parity: /root/reference/finmlkit/feature/core/reversion.py:9-56.
"""
from functools import partial

import jax
import jax.numpy as jnp

from ...config import feature_dtype as _fdt

from ._rolling import roll_sum, warmup_nan


@partial(jax.jit, static_argnames=("n_periods", "is_log"))
def _vwap_distance_impl(close, volume, n_periods: int, is_log: bool):
    wsum = roll_sum(close * volume, n_periods)
    vsum = roll_sum(volume, n_periods)
    vwap = wsum / jnp.where(vsum > 0, vsum, 1.0)
    if is_log:
        out = jnp.log(close / vwap)
    else:
        out = close / vwap - 1.0
    out = jnp.where(vsum > 0, out, jnp.nan)
    # reference forward-fills the (extremely rare) empty-window case
    idx = jnp.arange(close.shape[0])
    last_ok = jax.lax.cummax(jnp.where(vsum > 0, idx, -1))
    out = jnp.where(vsum > 0, out, out[jnp.clip(last_ok, 0)])
    # NOTE (reference quirk): index n_periods-1 uses the simple-return
    # formula even when is_log is True (reversion.py:40)
    first = close[n_periods - 1] / vwap[n_periods - 1] - 1.0
    out = out.at[n_periods - 1].set(
        jnp.where(vsum[n_periods - 1] > 0, first, jnp.nan))
    return warmup_nan(out, n_periods)


def vwap_distance(close, volume, n_periods: int, is_log: bool):
    """Distance of price from rolling VWAP."""
    close = jnp.asarray(close, _fdt())
    if close.shape[0] < n_periods:
        return jnp.full_like(close, jnp.nan)
    return _vwap_distance_impl(close, jnp.asarray(volume, _fdt()),
                               int(n_periods), bool(is_log))

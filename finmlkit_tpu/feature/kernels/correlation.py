"""Rolling price-volume correlation.

Parity: /root/reference/finmlkit/feature/core/correlation.py:9-111 —
rolling Pearson correlation between simple returns and volume with
NaN-pair exclusion. The reference contains a test-data special case
(correlation.py:42-65); per SURVEY.md §4 we implement the *pandas*
semantics (plain windowed moments) instead of replicating that hack.
"""
from functools import partial

import jax
import jax.numpy as jnp

from ...config import feature_dtype as _fdt

from ._rolling import roll_sum, warmup_nan


@partial(jax.jit, static_argnames=("window",))
def _pv_corr_impl(price, volume, window: int):
    n = price.shape[0]
    p0 = price[:-1]
    p1 = price[1:]
    bad = jnp.isnan(p1) | jnp.isnan(p0) | (p0 == 0)
    r = jnp.where(bad, jnp.nan, (p1 - p0) / jnp.where(p0 == 0, 1.0, p0))
    returns = jnp.concatenate([jnp.full((1,), jnp.nan), r])

    pair_ok = ~jnp.isnan(returns) & ~jnp.isnan(volume)
    rz = jnp.where(pair_ok, returns, 0.0)
    vz = jnp.where(pair_ok, volume, 0.0)
    cnt = roll_sum(pair_ok.astype(jnp.float64), window)
    sr = roll_sum(rz, window)
    sv = roll_sum(vz, window)
    srv = roll_sum(rz * vz, window)
    srr = roll_sum(rz * rz, window)
    svv = roll_sum(vz * vz, window)

    mean_r = sr / cnt
    mean_v = sv / cnt
    cov = srv - cnt * mean_r * mean_v
    var_r = srr - cnt * mean_r * mean_r
    var_v = svv - cnt * mean_v * mean_v
    corr = cov / jnp.sqrt(jnp.where(var_r > 0, var_r, 1.0)
                          * jnp.where(var_v > 0, var_v, 1.0))
    corr = jnp.clip(corr, -1.0, 1.0)
    ok = (cnt >= 2) & (var_r > 0) & (var_v > 0)
    out = jnp.where(ok & pair_ok, corr, jnp.nan)
    # reference starts at index `window` (not window-1)
    idx = jnp.arange(n)
    return jnp.where(idx >= window, out, jnp.nan)


def rolling_price_volume_correlation(price, volume, window: int):
    """Rolling Pearson corr(pct-change returns, volume)."""
    return _pv_corr_impl(jnp.asarray(price, _fdt()),
                         jnp.asarray(volume, _fdt()), int(window))

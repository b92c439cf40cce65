"""Chu-Stinchcombe-White CUSUM structural-break test (Homm & Breitung 2011).

Parity: /root/reference/finmlkit/feature/core/structural_break/cusum.py.
The reference computes, for each time t, the supremum over earlier points
n of S_{n,t} = (y_t - y_n) / (sigma_t * sqrt(t - n)) — an O(t) inner loop
under a prange. Here each t is a *vector over lags*: a (block x lags)
matrix per chunk, reduced on the lag axis — O(n*w) total work in
MXU/VPU-shaped tiles instead of scalar loops.

Tie-breaking matches the reference exactly: the sequential loop updates
its running max only on strictly-greater values while iterating n
ascending (lag descending), so ties keep the *largest* lag; the critical
value is sqrt(4.6 + log(lag*)) at that argmax lag.
"""
from functools import partial

import jax
import jax.numpy as jnp

from ...config import feature_dtype as _fdt


def _sup_stat(y_t, y_lagged, lag_k, sigma_t, lag_valid):
    """Sup statistic over the lag axis for a block of t's.

    y_t: (B,); y_lagged: (B, K) values y[t-k]; lag_k: (K,) lag sizes;
    sigma_t: (B,); lag_valid: (B, K) mask of admissible lags.
    Returns (up, down, crit_up, crit_down) per t.
    """
    dyn = y_t[:, None] - y_lagged                     # (B, K)
    denom = sigma_t[:, None] * jnp.sqrt(lag_k.astype(jnp.float64))[None, :]
    ok = lag_valid & (denom > 1e-16)
    s_up = jnp.where(ok, jnp.maximum(dyn, 0.0) / denom, -jnp.inf)
    s_down = jnp.where(ok, -jnp.minimum(dyn, 0.0) / denom, -jnp.inf)
    crit = jnp.sqrt(4.6 + jnp.log(lag_k.astype(jnp.float64)))[None, :]

    def reduce_side(s):
        best = jnp.max(s, axis=1)
        # ties keep the largest lag (reference iterates n ascending with
        # strict '>'), and only values > -1e-6 beat the init
        is_best = (s == best[:, None]) & jnp.isfinite(best)[:, None]
        lag_of_best = jnp.max(jnp.where(is_best, lag_k[None, :], -1), axis=1)
        has = jnp.isfinite(best) & (best > -1e-6)
        val = jnp.where(has, best, -1e-6)
        cv = jnp.where(has & (lag_of_best > 0),
                       jnp.sqrt(4.6 + jnp.log(jnp.maximum(lag_of_best, 1).astype(jnp.float64))),
                       0.0)
        return val, cv

    up, cu = reduce_side(s_up)
    down, cd = reduce_side(s_down)
    return up, down, cu, cd


@partial(jax.jit, static_argnames=("window_size", "warmup_period", "block"))
def _csw_rolling_impl(y, window_size: int, warmup_period: int, block: int):
    n = y.shape[0]
    w = window_size
    K = w - 1  # max lag within a window of length w+1 (lags 2..w-1 used)
    lag_k = jnp.arange(1, K + 1, dtype=jnp.int64)

    dy2 = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.diff(y) ** 2])
    cum_dy2 = jnp.cumsum(dy2)  # cum_dy2[t] = sum_{i<=t} (Δy_i)^2

    idx_all = jnp.arange(n)

    # per-t local window length: t' = min(t, w); sigma over the window
    t_loc = jnp.minimum(idx_all, w)
    win_start = idx_all - t_loc
    # sigma_t = sqrt( sum of squared diffs over the window / (t_loc - 1) )
    # (reference csd[t-1] covers diffs up to y[t]-y[t-1] = our cum_dy2[t])
    sum_dy2 = cum_dy2[idx_all] - cum_dy2[jnp.clip(win_start, 0, n - 1)]
    sigma = jnp.sqrt(sum_dy2 / jnp.maximum(t_loc - 1, 1))

    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    y_pad = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])

    def one_block(b):
        t0 = b * block
        t = t0 + jnp.arange(block)
        tc = jnp.clip(t, 0, n - 1)
        y_t = y_pad[tc]
        # lagged values y[t-k]
        gather_idx = jnp.clip(tc[:, None] - lag_k[None, :], 0, n - 1)
        y_lag = y[gather_idx]
        # admissible lags: local n in range(1, t_loc-1) -> k in [2, t_loc-1]
        tl = t_loc[tc]
        valid = (lag_k[None, :] >= 2) & (lag_k[None, :] <= tl[:, None] - 1) \
            & (t[:, None] < n)
        sig = sigma[tc]
        up, down, cu, cd = _sup_stat(y_t, y_lag, lag_k, sig, valid)
        bad = (tl < 1) | (sig <= 0.0)
        up = jnp.where(bad, -1e-6, up)
        down = jnp.where(bad, -1e-6, down)
        cu = jnp.where(bad, 0.0, cu)
        cd = jnp.where(bad, 0.0, cd)
        return up, down, cu, cd

    up, down, cu, cd = jax.lax.map(one_block, jnp.arange(n_blocks))
    up, down, cu, cd = (a.reshape(-1)[:n] for a in (up, down, cu, cd))
    ok = idx_all >= warmup_period
    nan = jnp.nan
    return (jnp.where(ok, up, nan), jnp.where(ok, down, nan),
            jnp.where(ok, cu, nan), jnp.where(ok, cd, nan))


def cusum_test_rolling(close_prices, window_size: int = 1000,
                       warmup_period: int = 30, block: int = 128):
    """Rolling CSW test. Parity: structural_break/cusum.py:179-274 —
    expanding statistics inside the first window, fixed-window afterwards;
    NaN before the warmup period.
    """
    close = jnp.asarray(close_prices, _fdt())
    if bool(jnp.any(close <= 0)):
        raise ValueError("All close prices must be positive.")
    n = close.shape[0]
    if window_size < warmup_period + 2:
        window_size = warmup_period + 2
    if n < warmup_period + 2:
        nanv = jnp.full((n,), jnp.nan)
        return nanv, nanv, nanv, nanv
    y = jnp.log(close)
    return _csw_rolling_impl(y, int(min(window_size, n)), int(warmup_period),
                             int(block))


def cusum_test_developing(y_prices, warmup_period: int = 30, block: int = 128):
    """Expanding-window CSW test. Parity: structural_break/cusum.py:69-133."""
    y = jnp.asarray(y_prices, _fdt())
    n = y.shape[0]
    return _csw_rolling_impl(jnp.log(y), n, int(warmup_period), int(block))


def cusum_test_last(y_prices, block: int = 128):
    """CSW test statistics at the last observation only.

    Parity: structural_break/cusum.py:136-176.
    """
    import numpy as np
    up, down, cu, cd = cusum_test_developing(y_prices, warmup_period=0,
                                             block=block)
    return (float(np.asarray(up)[-1]), float(np.asarray(down)[-1]),
            float(np.asarray(cu)[-1]), float(np.asarray(cd)[-1]))

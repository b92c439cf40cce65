"""Volatility estimators.

Parity: /root/reference/finmlkit/feature/core/volatility.py. Sequential
EWM recurrences become associative scans; per-window loops become
reduce_window reductions with NaN-aware counts.
"""
from functools import partial

import jax
import jax.numpy as jnp

from ...config import feature_dtype as _fdt

from ...ops.scan import linear_recurrence
from ._rolling import roll_nansum_count, roll_sum, warmup_nan


@partial(jax.jit, static_argnames=("span",))
def _ewms_impl(y, span: int):
    alpha = 2.0 / (span + 1.0)
    oma = 1.0 - alpha
    nan = jnp.isnan(y)
    one = jnp.where(nan, 0.0, 1.0)
    a1 = jnp.full_like(y, oma)
    a2 = jnp.full_like(y, oma * oma)
    s_w = linear_recurrence(a1, one)
    s_w2 = linear_recurrence(a2, one)
    yz = jnp.where(nan, 0.0, y)
    s_y = linear_recurrence(a1, yz)
    s_y2 = linear_recurrence(a1, yz * yz)
    mean = s_y / s_w
    denom = s_w - s_w2 / s_w
    var = (s_y2 / s_w - mean * mean) * s_w / denom
    var = jnp.maximum(var, 0.0)
    out = jnp.sqrt(var)
    out = jnp.where(denom > 0.0, out, jnp.nan)
    return jnp.where(s_w > 0.0, out, jnp.nan)


def ewms(y, span: int):
    """EWM standard deviation, adjust=True bias=False.

    Parity: core/volatility.py:9-69 (four decayed running sums; NaN
    samples decay the sums without contributing).
    """
    y = jnp.asarray(y, _fdt())
    if span <= 1:
        return jnp.full_like(y, jnp.nan)
    return _ewms_impl(y, int(span))


@partial(jax.jit, static_argnames=("mean0",))
def _ewmst_impl(timestamps, y, half_life, sigma_floor, mean0: bool = False):
    dt = jnp.diff(timestamps).astype(jnp.float64) / 1e9
    alpha = 1.0 - jnp.exp(-dt / half_life)  # per-step decay from Δt
    oma = 1.0 - alpha
    yi = y[1:]
    nan = jnp.isnan(yi)
    yz = jnp.where(nan, 0.0, yi)

    if mean0:
        v = linear_recurrence(oma, jnp.where(nan, 0.0, alpha))
        u = linear_recurrence(oma, jnp.where(nan, 0.0, alpha * yz * yz))
        var = jnp.where(v > 0.0, u / v, jnp.nan)
        var = jnp.maximum(var, 0.0)
        sigma = jnp.maximum(jnp.sqrt(var), sigma_floor)
        out_tail = sigma
    else:
        # NOTE: reference updates V/V2 with alpha even on NaN samples
        v = linear_recurrence(oma, alpha)
        v2 = linear_recurrence(oma * oma, alpha * alpha)
        sy = linear_recurrence(oma, jnp.where(nan, 0.0, alpha * yz))
        syy = linear_recurrence(oma, jnp.where(nan, 0.0, alpha * yz * yz))
        mean = sy / v
        var_raw = syy / v - mean * mean
        denom = v - v2 / v
        var = jnp.where((denom > 0.0) & (var_raw > 0.0), var_raw * v / denom, 0.0)
        sigma = jnp.maximum(jnp.sqrt(var), sigma_floor)
        out_tail = jnp.where(v > 0.0, sigma, jnp.nan)
    return jnp.concatenate([jnp.full((1,), jnp.nan, jnp.float64), out_tail])


def ewmst(timestamps, y, half_life, sigma_floor: float = 1e-12):
    """Time-decay (wall-clock half-life) EWM std for irregular series.

    Parity: core/volatility.py:139-219 — per-step alpha from Δt,
    adjust=True bias=False; NaN samples decay the y-sums but the weight
    sums still receive alpha (reference quirk preserved).
    """
    return _ewmst_impl(jnp.asarray(timestamps, jnp.int64),
                       jnp.asarray(y, _fdt()),
                       jnp.float64(half_life), jnp.float64(sigma_floor), False)


def ewmst_mean0(timestamps, y, half_life, sigma_floor: float = 1e-12):
    """Zero-mean time-decay EWM std. Parity: core/volatility.py:72-136."""
    return _ewmst_impl(jnp.asarray(timestamps, jnp.int64),
                       jnp.asarray(y, _fdt()),
                       jnp.float64(half_life), jnp.float64(sigma_floor), True)


@jax.jit
def true_range(high, low, close):
    """TR with NaN propagation. Parity: core/volatility.py:222-253."""
    high = jnp.asarray(high, _fdt())
    low = jnp.asarray(low, _fdt())
    close = jnp.asarray(close, _fdt())
    pc = jnp.concatenate([jnp.full((1,), jnp.nan), close[:-1]])
    tr = jnp.maximum(high - low,
                     jnp.maximum(jnp.abs(high - pc), jnp.abs(low - pc)))
    tr0 = high[0] - low[0]
    tr = tr.at[0].set(tr0)
    bad = jnp.isnan(high) | jnp.isnan(low)
    bad = bad | jnp.concatenate([jnp.zeros((1,), bool), jnp.isnan(close[:-1])])
    return jnp.where(bad, jnp.nan, tr)


@partial(jax.jit, static_argnames=("window", "is_sample"))
def _realized_vol_impl(r, window: int, is_sample: bool):
    s2, cnt = roll_nansum_count(r * r, window)
    div = jnp.where(is_sample, cnt - 1.0, cnt)
    out = jnp.sqrt(s2 / div)
    out = jnp.where(cnt > 1, out, jnp.nan)
    return warmup_nan(out, window)


def realized_vol(r, window: int, is_sample: bool):
    """Rolling sqrt(nansum(r^2)/n). Parity: core/volatility.py:256-286."""
    return _realized_vol_impl(jnp.asarray(r, _fdt()), int(window),
                              bool(is_sample))


@partial(jax.jit, static_argnames=("window",))
def _bollinger_impl(close, window: int, num_std):
    s = roll_sum(close, window)
    s2 = roll_sum(close * close, window)
    mean = s / window
    var = (s2 - window * mean * mean) / (window - 1)
    sd = jnp.sqrt(jnp.maximum(var, 0.0))
    lower = mean - num_std * sd
    upper = mean + num_std * sd
    out = jnp.where(upper > lower, (close - lower) / (upper - lower), jnp.nan)
    return warmup_nan(out, window)


def bollinger_percent_b(close, window: int, num_std: float):
    """Bollinger %B via rolling sum/sumsq. Parity: core/volatility.py:289-338."""
    return _bollinger_impl(jnp.asarray(close, _fdt()), int(window),
                           jnp.float64(num_std))


@jax.jit
def parkinson_range(high, low):
    """ln(h/l)^2 / (4 ln 2). Parity: core/volatility.py:341-349."""
    high = jnp.asarray(high, _fdt())
    low = jnp.asarray(low, _fdt())
    return jnp.log(high / low) ** 2 / (4.0 * jnp.log(2.0))


@partial(jax.jit, static_argnames=("window", "ema_based", "normalize"))
def _atr_impl(high, low, close, window: int, ema_based: bool, normalize: bool):
    n = high.shape[0]
    tr = true_range(high, low, close)
    if ema_based:
        # seed: mean of valid TR over the first window
        head = tr[:window]
        valid = ~jnp.isnan(head)
        seed = jnp.where(valid.sum() > 0,
                         jnp.where(valid, head, 0.0).sum() / valid.sum(),
                         jnp.nan)
        # ATR_t = ((w-1) ATR_{t-1} + TR_t)/w for t >= window
        tail = tr[window:]
        if tail.shape[0] > 0:
            a = jnp.full_like(tail, (window - 1.0) / window)
            out_tail = linear_recurrence(a, tail / window, y0=seed)
        else:
            out_tail = tail
        out = jnp.concatenate([
            jnp.full((window - 1,), jnp.nan), seed[None], out_tail])
    else:
        s, cnt = roll_nansum_count(tr, window)
        out = jnp.where(cnt > 0, s / cnt, jnp.nan)
        out = warmup_nan(out, window)
        # reference quirk: index 2 forced NaN when high/low/close all NaN
        if n > 2:
            all_nan2 = jnp.isnan(high[2]) & jnp.isnan(low[2]) & jnp.isnan(close[2])
            out = out.at[2].set(jnp.where(all_nan2, jnp.nan, out[2]))
    if normalize:
        mid = (high + low) / 2.0
        out = jnp.where(~jnp.isnan(out) & ~jnp.isnan(mid) & (mid > 0),
                        out / mid, out)
    return out


def atr(high, low, close, window: int, ema_based: bool = False,
        normalize: bool = False):
    """Average True Range (SMA- or Wilder-EMA-based).

    Parity: core/volatility.py:352-437.
    """
    high = jnp.asarray(high, _fdt())
    if high.shape[0] < window:
        return jnp.full_like(high, jnp.nan)
    return _atr_impl(high, jnp.asarray(low, _fdt()),
                     jnp.asarray(close, _fdt()), int(window),
                     bool(ema_based), bool(normalize))


@partial(jax.jit, static_argnames=("window", "ddof", "min_periods"))
def _rolling_var_impl(x, window: int, ddof: int, min_periods: int):
    s, cnt = roll_nansum_count(x, window)
    s2, _ = roll_nansum_count(x * x, window)
    mean = s / cnt
    var = (s2 / cnt - mean * mean) * (cnt / (cnt - ddof))
    var = jnp.maximum(var, 0.0)
    ok = (cnt >= min_periods) & (cnt > ddof)
    return warmup_nan(jnp.where(ok, var, jnp.nan), window)


def rolling_variance(series, window: int, ddof: int = 1, min_periods: int = 1):
    """NaN-aware rolling variance. Parity: core/volatility.py:440-478."""
    series = jnp.asarray(series, _fdt())
    if series.shape[0] < window:
        return jnp.full_like(series, jnp.nan)
    return _rolling_var_impl(series, int(window), int(ddof), int(min_periods))


def variance_ratio_1_4(price, window: int, ddof: int = 1, ret_type: str = "log"):
    """var(1-bar ret) / (var(4-bar ret)/4). Parity: core/volatility.py:481-540."""
    price = jnp.asarray(price, _fdt())
    n = price.shape[0]
    if n < window + 4:
        return jnp.full_like(price, jnp.nan)
    p0 = price[:-1]
    p1 = price[1:]
    if ret_type == "log":
        bad = jnp.isnan(p0) | jnp.isnan(p1) | (p0 <= 0) | (p1 <= 0)
        r = jnp.where(bad, jnp.nan, jnp.log(p1 / p0))
    else:
        bad = jnp.isnan(p0) | jnp.isnan(p1) | (p0 <= 0)
        r = jnp.where(bad, jnp.nan, p1 / p0 - 1.0)
    r1 = jnp.concatenate([jnp.full((1,), jnp.nan), r])
    var1 = rolling_variance(r1, window, ddof)
    # non-overlapping 4-bar returns as sums of 4 consecutive 1-bar returns
    r4 = r1 + jnp.roll(r1, 1) + jnp.roll(r1, 2) + jnp.roll(r1, 3)
    idx = jnp.arange(n)
    r4 = jnp.where(idx >= 4, r4, jnp.nan)
    var4 = rolling_variance(r4, window, ddof)
    ok = ~jnp.isnan(var1) & ~jnp.isnan(var4) & (var4 > 0)
    return jnp.where(ok, var1 / (var4 / 4.0), jnp.nan)

"""Transform catalog: ~35 bar-level indicators.

Parity: /root/reference/finmlkit/feature/transforms.py — same class
names, constructor signatures, output-name conventions and dual-backend
behavior. The native tier is JAX (``_jax``, reached via backend="jax" or
the reference-compatible alias "nb"); the ``_pd`` tier is pandas.
Transforms that are pandas-only in the reference (calendar logic such as
DailyGap / ORBBreak) stay host-side here too; several others that the
reference left pandas-only (TrendSlope, Kurtosis, Hurst, BiPowerVariation,
BarRate, DirRunLen) get real vectorized JAX implementations.
"""
from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy import stats

from ..utils.log import get_logger
from . import kernels as K
from .base import (
    BaseTransform,
    MIMOTransform,
    MISOTransform,
    SIMOTransform,
    SISOTransform,
)
from .kernels._rolling import roll_sum, warmup_nan

logger = get_logger(__name__)


class Identity(BaseTransform):
    """Return a column unchanged (transforms.py:25)."""

    def __init__(self, input_col: str = "close"):
        assert isinstance(input_col, str), "Input column must be a string."
        super().__init__(input_col, input_col)

    def __call__(self, df: pd.DataFrame, *, backend="jax") -> pd.Series:
        self._validate_input(df)
        return df[self.requires[0]]

    def _validate_input(self, x):
        if self.requires[0] not in x.columns:
            raise ValueError(f"Input DataFrame must contain the column '{self.requires[0]}'.")
        return True

    @property
    def output_name(self) -> str:
        return self.produces[0]


class Lag(SISOTransform):
    """Lagged values (transforms.py:63)."""

    def __init__(self, periods: int = 1, input_col: str = "close"):
        super().__init__(input_col, f"lag{periods}")
        self.periods = periods

    def _pd(self, x):
        outp = x[self.requires[0]].shift(self.periods)
        outp.name = self.output_name
        return outp

    def _jax(self, x):
        arr = jnp.asarray(self._prepare_input(x), jnp.float64)
        out = jnp.where(jnp.arange(arr.shape[0]) < self.periods, jnp.nan,
                        jnp.roll(arr, self.periods))
        return self._prepare_output(x.index, out)


class ReturnT(SISOTransform):
    """Time-window returns on irregular series (transforms.py:89)."""

    def __init__(self, window: pd.Timedelta = pd.Timedelta(seconds=1e-6),
                 is_log: bool = False, input_col: str = "close"):
        window_sec = window.total_seconds()
        output_col = f"ret{window_sec}s" if window_sec > 1e-6 else "ret1"
        super().__init__(input_col, output_col)
        self.window_sec = window_sec
        self.is_log = is_log

    def _pd(self, x):
        # genuine pandas/numpy tier (the reference's own _pd falls back
        # to its numba kernel, transforms.py:104-106 — this exceeds it)
        s = x[self.requires[0]]
        close = s.to_numpy(np.float64)
        ts = self._get_timestamps(x).astype(np.float64)
        n = len(close)
        win_ns = self.window_sec * 1e9
        lag_idx = np.searchsorted(ts, ts - win_ns, side="right") - 1
        idx = np.arange(n)
        ok = (lag_idx >= 0) & (lag_idx < idx)
        base = close[np.clip(lag_idx, 0, n - 1)]
        safe = np.where(base != 0.0, base, 1.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            ret = np.log(close / safe) if self.is_log else close / safe - 1.0
        ret = np.where(base != 0.0, ret, np.inf)
        ret = np.where(ok, ret, np.nan)
        start = np.searchsorted(ts, ts[0] + win_ns, side="left")
        ret[:start] = np.nan
        return pd.Series(ret, index=s.index, name=self.output_name)

    def _jax(self, x):
        result = K.comp_lagged_returns(self._get_timestamps(x),
                                       self._prepare_input(x),
                                       self.window_sec, self.is_log)
        return self._prepare_output(x.index, result)


class Return(SISOTransform):
    """Fixed-period returns (transforms.py:120)."""

    def __init__(self, periods: int = 1, input_col: str = "close", is_log: bool = False):
        super().__init__(input_col, f"ret{periods}")
        self.periods = periods
        self.is_log = is_log

    def _pd(self, x):
        series = x[self.requires[0]]
        lagged = series.shift(self.periods)
        outp = np.log(series / lagged) if self.is_log else series / lagged - 1.0
        return pd.Series(outp, index=series.index, name=self.output_name)

    def _jax(self, x):
        arr = jnp.asarray(self._prepare_input(x), jnp.float64)
        lag = jnp.roll(arr, self.periods)
        out = jnp.log(arr / lag) if self.is_log else arr / lag - 1.0
        out = jnp.where(jnp.arange(arr.shape[0]) < self.periods, jnp.nan, out)
        return self._prepare_output(x.index, out)


class ROC(SISOTransform):
    """Rate of change (transforms.py:155)."""

    def __init__(self, periods: int, input_col: str = "close"):
        super().__init__(input_col, f"roc{periods}")
        self.periods = periods

    def _pd(self, x):
        # genuine pandas tier (reference _pd falls back to numba)
        s = x[self.requires[0]]
        lag = s.shift(self.periods)
        out = (s - lag) / lag * 100.0
        out.name = self.output_name
        return out

    def _jax(self, x):
        return self._prepare_output(
            x.index, K.roc(self._prepare_input(x), self.periods))


class PctChange(SISOTransform):
    """Lagged percent change (transforms.py:180)."""

    def __init__(self, window: int, input_col: str = "close"):
        super().__init__(input_col, f"pctc{window}")
        self.periods = window

    def _pd(self, x):
        return x[self.requires[0]].pct_change(self.periods)

    def _jax(self, x):
        return self._prepare_output(
            x.index, K.pct_change(self._prepare_input(x), self.periods))


class RSIWilder(SISOTransform):
    """Wilder RSI (transforms.py:206)."""

    def __init__(self, window: int = 14, input_col: str = "close"):
        super().__init__(input_col, f"rsiw{window}")
        self.window = window

    def _pd(self, x):
        series = x[self.requires[0]]
        delta = series.diff()
        gains = delta.clip(lower=0)
        losses = (-delta).clip(lower=0)
        rsi = pd.Series(np.nan, index=series.index)
        avg_gain = gains.iloc[1:self.window + 1].mean()
        avg_loss = losses.iloc[1:self.window + 1].mean()
        rs = avg_gain / avg_loss if avg_loss != 0 else float("inf")
        rsi.iloc[self.window] = 100 - 100 / (1 + rs) if rs != float("inf") else 100
        for i in range(self.window + 1, len(series)):
            avg_gain = ((self.window - 1) * avg_gain + gains.iloc[i]) / self.window
            avg_loss = ((self.window - 1) * avg_loss + losses.iloc[i]) / self.window
            rs = avg_gain / avg_loss if avg_loss != 0 else float("inf")
            rsi.iloc[i] = 100 - 100 / (1 + rs) if rs != float("inf") else 100
        rsi.name = self.output_name
        return rsi

    def _jax(self, x):
        return self._prepare_output(
            x.index, K.rsi_wilder(self._prepare_input(x), self.window))


class StochK(MISOTransform):
    """Stochastic %K (transforms.py:276). Inputs [high, low, close]."""

    def __init__(self, length: int = 14, input_cols=None):
        if input_cols is None:
            input_cols = ["high", "low", "close"]
        super().__init__(input_cols, f"stochk{length}")
        self.length = length

    def _pd(self, x):
        # genuine pandas tier (reference _pd falls back to numba),
        # preserving the reference's positional-argument quirk below
        h, l, c = (x[col] for col in self.requires)
        if len(h) < self.length:
            return pd.Series(np.nan, index=x.index, name=self.output_name)
        lo = l.rolling(self.length).min()
        hi = c.rolling(self.length).max()
        out = 100.0 * (h - lo) / (hi - lo)
        out[~(hi > lo)] = np.nan
        out.iloc[:self.length - 1] = np.nan
        out.name = self.output_name
        return out

    def _jax(self, x):
        d = self._prepare_input(x)
        # reference passes (high, low, close) into stoch_k(close, low, high)
        # positionally — i.e. 'high' fills the close slot (transforms.py:302)
        result = K.stoch_k(d[self.requires[0]], d[self.requires[1]],
                           d[self.requires[2]], self.length)
        return self._prepare_output(x.index, result)


class EWMST(SISOTransform):
    """Time-decay EWM std (transforms.py:308)."""

    def __init__(self, half_life: pd.Timedelta, input_col: str = "y"):
        half_life_sec = half_life.total_seconds()
        super().__init__(input_col, f"ewms{half_life_sec}s")
        self.half_life = half_life  # kept for config introspection
        self.half_life_sec = half_life_sec

    def _pd(self, x):
        # genuine sequential numpy tier (reference _pd falls back to
        # numba): per-step alpha from wall-clock dt, adjust=True
        # bias=False, NaN samples decay V/V2 but not the y-sums
        s = x[self.requires[0]]
        y = s.to_numpy(np.float64)
        ts = self._get_timestamps(x)
        n = len(y)
        out = np.full(n, np.nan)
        v = v2 = sy = syy = 0.0
        for i in range(1, n):
            a = 1.0 - np.exp(-((ts[i] - ts[i - 1]) / 1e9) / self.half_life_sec)
            oma = 1.0 - a
            v = oma * v + a
            v2 = oma * oma * v2 + a * a
            if not np.isnan(y[i]):
                sy = oma * sy + a * y[i]
                syy = oma * syy + a * y[i] * y[i]
            else:
                sy = oma * sy
                syy = oma * syy
            if v > 0.0:
                mean = sy / v
                var_raw = syy / v - mean * mean
                denom = v - v2 / v
                var = var_raw * v / denom if (denom > 0.0 and var_raw > 0.0) else 0.0
                out[i] = max(np.sqrt(var), 1e-12)
        return pd.Series(out, index=s.index, name=self.output_name)

    def _jax(self, x):
        result = K.ewmst(self._get_timestamps(x), self._prepare_input(x),
                         self.half_life_sec)
        return self._prepare_output(x.index, result)


class ZScore(SISOTransform):
    """Rolling z-score (transforms.py:335)."""

    def __init__(self, window: int, input_col: str, ddof: int = 0):
        super().__init__(input_col, f"z{window}")
        self.window = window
        self.ddof = ddof

    def _pd(self, x):
        # genuine pandas tier (reference _pd falls back to numba)
        s = x[self.requires[0]]
        r = s.rolling(self.window)
        mean = r.mean()
        std = r.std(ddof=self.ddof)
        out = (s - mean) / std
        out[std == 0] = np.nan
        out.name = self.output_name
        return out

    def _jax(self, x):
        return self._prepare_output(
            x.index, K.comp_zscore(self._prepare_input(x), self.window, self.ddof))


class BurstRatio(SISOTransform):
    """x / rolling median (transforms.py:362)."""

    def __init__(self, window: int, input_col: str):
        super().__init__(input_col, f"burst{window}")
        self.window = window

    def _pd(self, x):
        # genuine pandas tier (reference _pd falls back to numba)
        s = x[self.requires[0]]
        med = s.rolling(self.window).median()
        out = s / med
        out[~(med > 0)] = np.nan
        out.name = self.output_name
        return out

    def _jax(self, x):
        return self._prepare_output(
            x.index, K.comp_burst_ratio(self._prepare_input(x), self.window))


class VWAPDistance(MISOTransform):
    """Price distance from rolling VWAP (transforms.py:388)."""

    def __init__(self, periods: int, is_log: bool = False, input_cols=None):
        if input_cols is None:
            input_cols = ["close", "volume"]
        super().__init__(input_cols, f"vwapd{periods}")
        self.periods = periods
        self.is_log = is_log

    def _pd(self, x):
        # genuine pandas tier (reference _pd falls back to numba),
        # preserving the reference quirks: the first valid index always
        # uses the simple-return formula, and empty-volume windows
        # forward-fill the previous value
        c, v = x[self.requires[0]], x[self.requires[1]]
        p = self.periods
        if len(c) < p:
            return pd.Series(np.nan, index=x.index, name=self.output_name)
        wsum = (c * v).rolling(p).sum()
        vsum = v.rolling(p).sum()
        vwap = wsum / vsum.where(vsum > 0, 1.0)
        out = np.log(c / vwap) if self.is_log else c / vwap - 1.0
        first = (c.iloc[p - 1] / vwap.iloc[p - 1] - 1.0
                 if vsum.iloc[p - 1] > 0 else np.nan)
        out.iloc[p - 1] = first
        out = out.where(vsum > 0).ffill()
        out.iloc[:p - 1] = np.nan
        out.name = self.output_name
        return out

    def _jax(self, x):
        d = self._prepare_input(x)
        result = K.vwap_distance(d[self.requires[0]], d[self.requires[1]],
                                 self.periods, self.is_log)
        return self._prepare_output(x.index, result)


class TimeCues(SIMOTransform):
    """Cyclical time-of-day/week cues + session flags (transforms.py:421)."""

    def __init__(self, input_col: str = "close"):
        produces = ["sin_td", "cos_td", "sin_dw", "cos_dw", "asia", "eu",
                    "us", "sess_x", "top_hr"]
        super().__init__(input_col, produces)

    def _pd(self, x):
        # genuine pandas tier (reference _pd falls back to numba)
        idx = x.index
        sec_in_day = (idx.hour * 3600 + idx.minute * 60
                      + idx.second).to_numpy(np.int64)
        phase = 2.0 * np.pi * sec_in_day / 86400.0
        # kernel's (days_since_epoch + 3) % 7 equals pandas dayofweek
        # (Monday=0): epoch 1970-01-01 was a Thursday
        day_week = idx.dayofweek.to_numpy(np.int64)
        phase_w = 2.0 * np.pi * day_week / 7.0
        hour = idx.hour.to_numpy(np.int64)
        minute = idx.minute.to_numpy(np.int64)
        asia = (hour >= 0) & (hour < 8)
        eu = (hour >= 7) & (hour < 15)
        us = (hour >= 13) & (hour < 21)
        trans = ((hour == 0) | (hour == 7) | (hour == 13)) & (minute == 0)
        top_hr = minute == 0
        return self._prepare_output(
            idx, (np.sin(phase), np.cos(phase), np.sin(phase_w),
                  np.cos(phase_w), asia, eu, us, trans, top_hr))

    def _jax(self, x):
        return self._prepare_output(x.index, K.time_cues(self._get_timestamps(x)))

    @property
    def output_name(self):
        return self.produces


class RealizedVolatility(SISOTransform):
    """Rolling realized vol (transforms.py:450)."""

    def __init__(self, window: int, is_sample=False, input_col: str = "ret"):
        super().__init__(input_col, f"rv{window}")
        self.window = window
        self.is_sample = is_sample

    def _pd(self, x):
        series = x[self.requires[0]]

        def f(w):
            cnt = w.count()
            if cnt > 1:
                div = (cnt - 1) if self.is_sample else cnt
                return np.sqrt((w ** 2).sum(skipna=True) / div)
            return np.nan
        result = series.rolling(self.window).apply(f, raw=False)
        result.name = self.output_name
        return result

    def _jax(self, x):
        return self._prepare_output(
            x.index,
            K.realized_vol(self._prepare_input(x).astype(np.float64),
                           self.window, self.is_sample))


class BollingerPercentB(SISOTransform):
    """Bollinger %B (transforms.py:494)."""

    def __init__(self, window: int, num_std: float = 2.0, input_col: str = "close"):
        super().__init__(input_col, f"bollb{window}")
        self.window = window
        self.num_std = num_std

    def _pd(self, x):
        s = x[self.requires[0]]
        mean = s.rolling(self.window).mean()
        sd = s.rolling(self.window).std()
        lower = mean - self.num_std * sd
        upper = mean + self.num_std * sd
        out = (s - lower) / (upper - lower)
        out.name = self.output_name
        return out

    def _jax(self, x):
        return self._prepare_output(
            x.index,
            K.bollinger_percent_b(self._prepare_input(x), self.window, self.num_std))


class ParkinsonRange(MISOTransform):
    """ln(h/l)^2 / 4ln2 (transforms.py:521). Inputs [high, low]."""

    def __init__(self, input_cols=None):
        if input_cols is None:
            input_cols = ["high", "low"]
        super().__init__(input_cols, "parkrange")

    def _pd(self, x):
        # genuine pandas tier (reference _pd falls back to numba)
        h, l = x[self.requires[0]], x[self.requires[1]]
        out = np.log(h / l) ** 2 / (4.0 * np.log(2.0))
        out.name = self.output_name
        return out

    def _jax(self, x):
        d = self._prepare_input(x)
        result = K.parkinson_range(d[self.requires[0]], d[self.requires[1]])
        return self._prepare_output(x.index, result)


class SMA(SISOTransform):
    """Simple moving average (transforms.py:549)."""

    def __init__(self, window: int, input_col: str = "x"):
        super().__init__(input_col, f"sma{window}")
        self.window = window

    def _pd(self, x):
        outp = x[self.requires[0]].rolling(window=self.window).mean()
        outp.name = self.output_name
        return outp

    def _jax(self, x):
        return self._prepare_output(
            x.index, K.sma(self._prepare_input(x), self.window))


class EWMA(SISOTransform):
    """Exponentially weighted moving average (transforms.py:577)."""

    def __init__(self, span: int, input_col: str = None):
        super().__init__(input_col, f"ewma{span}")
        self.span = span

    def _pd(self, x):
        outp = x[self.requires[0]].ewm(span=self.span).mean()
        outp.name = self.output_name
        return outp

    def _jax(self, x):
        return self._prepare_output(
            x.index, K.ewma(self._prepare_input(x), self.span))


class FlowAcceleration(SISOTransform):
    """log(recent/past volume-sum ratio) (transforms.py:605)."""

    def __init__(self, window: int, recent_periods, input_col: str = "volume"):
        super().__init__(input_col, f"flowacc_{window}_{recent_periods}")
        self.window = window
        self.recent_periods = recent_periods

    def _pd(self, x):
        # genuine pandas tier (reference _pd falls back to numba)
        v = x[self.requires[0]]
        if len(v) < self.window or self.recent_periods >= self.window:
            return pd.Series(np.nan, index=x.index, name=self.output_name)
        eps = 1e-12
        recent = v.rolling(self.recent_periods).sum()
        past = v.rolling(self.window).sum() - recent
        out = np.log((recent + eps) / (past + eps))
        out.iloc[:self.window - 1] = np.nan
        out.name = self.output_name
        return out

    def _jax(self, x):
        return self._prepare_output(
            x.index,
            K.comp_flow_acceleration(self._prepare_input(x), self.window,
                                     self.recent_periods))


class CUSUMTest(SIMOTransform):
    """CSW structural-break score/flag/age features (transforms.py:631)."""

    def __init__(self, window_size: int = 50, warmup_period: int = 30,
                 max_age: int = 144, input_col: str = "close"):
        base_up = f"cumote_up{window_size}"
        base_down = f"cumote_down{window_size}"
        produces = [
            f"{base_up}_score", f"{base_down}_score",
            f"{base_up}_flag", f"{base_down}_flag",
            f"{base_up}_age", f"{base_down}_age",
        ]
        super().__init__(input_col, produces)
        self.window_size = window_size
        self.warmup_period = warmup_period
        self.max_age = max_age

    def _pd(self, x):
        # genuine sequential numpy tier (reference _pd falls back to
        # numba): per-t sup over lags of (y_t - y_{t-k}) / (sigma sqrt(k)),
        # strict-> updates while iterating n ascending (ties keep the
        # largest lag), critical value sqrt(4.6 + ln(lag*))
        y = np.log(x[self.requires[0]].to_numpy(np.float64))
        n = len(y)
        w = self.window_size
        dy2 = np.concatenate([[0.0], np.diff(y) ** 2])
        cum = np.cumsum(dy2)
        up = np.full(n, -1e-6)
        down = np.full(n, -1e-6)
        cu = np.zeros(n)
        cd = np.zeros(n)
        for t in range(n):
            t_loc = min(t, w)
            if t_loc < 1:
                continue
            sigma = np.sqrt((cum[t] - cum[t - t_loc]) / max(t_loc - 1, 1))
            if sigma <= 0.0:
                continue
            ks = np.arange(2, t_loc)  # admissible lags [2, t_loc-1]
            if len(ks) == 0:
                continue
            dyn = y[t] - y[t - ks]
            denom = sigma * np.sqrt(ks)
            s_up = np.maximum(dyn, 0.0) / denom
            s_down = -np.minimum(dyn, 0.0) / denom

            def best(s):
                b = s.max()
                if b <= -1e-6:
                    return -1e-6, 0.0
                lag = ks[np.nonzero(s == b)[0]].max()
                return b, np.sqrt(4.6 + np.log(lag))

            up[t], cu[t] = best(s_up)
            down[t], cd[t] = best(s_down)
        mask = np.arange(n) < self.warmup_period
        for arr in (up, down, cu, cd):
            arr[mask] = np.nan
        return self._post(x, up, down, cu, cd)

    def _jax(self, x):
        snt_up, snt_down, cv_up, cv_down = K.cusum_test_rolling(
            self._prepare_input(x), self.window_size, self.warmup_period)
        return self._post(x, snt_up, snt_down, cv_up, cv_down)

    def _post(self, x, snt_up, snt_down, cv_up, cv_down):
        break_up = np.asarray(snt_up) - np.asarray(cv_up)
        break_down = np.asarray(snt_down) - np.asarray(cv_down)
        flag_up = (break_up > 0).astype(np.bool_)
        flag_down = (break_down > 0).astype(np.bool_)
        score_up = np.clip(break_up, -10, 10)
        score_down = np.clip(break_down, -10, 10)
        # age: bars since last break (groupby-cumcount, cf. transforms.py:694)
        fu = pd.Series(flag_up, index=x.index)
        fd = pd.Series(flag_down, index=x.index)
        age_up = fu.groupby((fu == 1).cumsum()).cumcount() \
            .clip(0, self.max_age).astype(np.uint8).values
        age_down = fd.groupby((fd == 1).cumsum()).cumcount() \
            .clip(0, self.max_age).astype(np.uint8).values
        return self._prepare_output(
            x.index, (score_up, score_down, flag_up, flag_down, age_up, age_down))

    @property
    def output_name(self):
        return self.produces


class ATR(MISOTransform):
    """Average True Range (transforms.py:711). Inputs [high, low, close]."""

    def __init__(self, window: int = 14, ema_based: bool = False,
                 normalize: bool = False, input_cols=None):
        if input_cols is None:
            input_cols = ["high", "low", "close"]
        output_name = f"atr{window}"
        if ema_based:
            output_name += "_ema"
        if normalize:
            output_name += "_norm"
        super().__init__(input_cols, output_name)
        self.window = window
        self.ema_based = ema_based
        self.normalize = normalize

    def _pd(self, x):
        # genuine pandas tier (reference _pd falls back to numba)
        h, l, c = (x[col] for col in self.requires)
        w = self.window
        if len(h) < w:
            return pd.Series(np.nan, index=x.index, name=self.output_name)
        pc = c.shift(1)
        tr = pd.concat([h - l, (h - pc).abs(), (l - pc).abs()], axis=1).max(
            axis=1, skipna=False)
        tr.iloc[0] = h.iloc[0] - l.iloc[0]
        if self.ema_based:
            vals = tr.to_numpy(np.float64)
            out = np.full(len(vals), np.nan)
            head = vals[:w]
            if np.any(~np.isnan(head)):
                a = np.nanmean(head)
                out[w - 1] = a
                for i in range(w, len(vals)):
                    a = ((w - 1) * a + vals[i]) / w
                    out[i] = a
            out = pd.Series(out, index=x.index)
        else:
            out = tr.rolling(w, min_periods=1).mean()
            out.iloc[:w - 1] = np.nan
            if len(out) > 2 and np.isnan(h.iloc[2]) and np.isnan(l.iloc[2]) \
                    and np.isnan(c.iloc[2]):
                out.iloc[2] = np.nan  # reference quirk
        if self.normalize:
            mid = (h + l) / 2.0
            m = ~out.isna() & ~mid.isna() & (mid > 0)
            out = out.where(~m, out / mid)
        out.name = self.output_name
        return out

    def _jax(self, x):
        d = self._prepare_input(x)
        result = K.atr(d[self.requires[0]], d[self.requires[1]],
                       d[self.requires[2]], self.window, self.ema_based,
                       self.normalize)
        return self._prepare_output(x.index, result)


class PriceVolumeCorrelation(MISOTransform):
    """Rolling corr(returns, volume) (transforms.py:754)."""

    def __init__(self, window: int = 8, input_cols=None):
        if input_cols is None:
            input_cols = ["close", "volume"]
        super().__init__(input_cols, f"corr_pv_{window}")
        self.window = window

    def _pd(self, x):
        returns = x[self.requires[0]].pct_change()
        result = returns.rolling(window=self.window).corr(x[self.requires[1]])
        result.name = self.output_name
        return result

    def _jax(self, x):
        d = self._prepare_input(x)
        result = K.rolling_price_volume_correlation(
            d[self.requires[0]], d[self.requires[1]], self.window)
        return self._prepare_output(x.index, result)


class VPIN(MISOTransform):
    """Volume-synchronized probability of informed trading (transforms.py:816)."""

    def __init__(self, window: int = 32, input_cols=None):
        if input_cols is None:
            input_cols = ["volume_buy", "volume_sell"]
        super().__init__(input_cols, f"vpin_{window}")
        self.window = window

    def _pd(self, x):
        imb = (x[self.requires[0]] - x[self.requires[1]]).abs()
        tot = x[self.requires[0]] + x[self.requires[1]]
        result = imb.rolling(self.window).sum() / tot.rolling(self.window).sum()
        result.name = self.output_name
        return result

    def _jax(self, x):
        d = self._prepare_input(x)
        result = K.vpin(d[self.requires[0]], d[self.requires[1]], self.window)
        return self._prepare_output(x.index, result)


class VarianceRatio14(SISOTransform):
    """var(1-bar ret)/(var(4-bar ret)/4) (transforms.py:867)."""

    def __init__(self, window: int = 32, input_col: str = "close",
                 ret_type: str = "log", ddof: int = 0):
        super().__init__(input_col, f"var_ratio_1_4_{window}")
        self.window = window
        self.ret_type = ret_type
        self.ddof = ddof

    def _pd(self, x):
        # genuine pandas tier (reference _pd falls back to numba)
        s = x[self.requires[0]]
        n, w = len(s), self.window
        if n < w + 4:
            return pd.Series(np.nan, index=x.index, name=self.output_name)
        p0, p1 = s.shift(1), s
        if self.ret_type == "log":
            bad = p0.isna() | p1.isna() | (p0 <= 0) | (p1 <= 0)
            r1 = np.log(p1 / p0).where(~bad)
        else:
            bad = p0.isna() | p1.isna() | (p0 <= 0)
            r1 = (p1 / p0 - 1.0).where(~bad)

        def roll_var(r):
            v = r.rolling(w, min_periods=1).var(ddof=self.ddof)
            cnt = r.rolling(w, min_periods=1).count()
            v = v.where((cnt >= 1) & (cnt > self.ddof))
            v.iloc[:w - 1] = np.nan
            return v.clip(lower=0.0)

        var1 = roll_var(r1)
        r4 = r1 + r1.shift(1) + r1.shift(2) + r1.shift(3)
        r4.iloc[:4] = np.nan
        var4 = roll_var(r4)
        out = (var1 / (var4 / 4.0)).where(var4 > 0)
        out.name = self.output_name
        return out

    def _jax(self, x):
        result = K.variance_ratio_1_4(self._prepare_input(x), self.window,
                                      self.ddof, self.ret_type)
        return self._prepare_output(x.index, result)


class KurtosisTransform(SISOTransform):
    """Rolling excess kurtosis (transforms.py:900).

    The reference is pandas-only (scipy.stats.kurtosis); the JAX tier
    computes the same Fisher excess kurtosis from windowed moments.
    """

    def __init__(self, window: int = 32, input_col: str = "ret1"):
        super().__init__(input_col, f"kurt_{window}")
        self.window = window

    def _pd(self, x):
        series = x[self.requires[0]]
        result = series.rolling(window=self.window).apply(
            lambda w: stats.kurtosis(w, nan_policy="omit"), raw=True)
        result.name = self.output_name
        return result

    def _jax(self, x):
        arr = jnp.asarray(self._prepare_input(x), jnp.float64)
        w = self.window
        valid = ~jnp.isnan(arr)
        az = jnp.where(valid, arr, 0.0)
        cnt = roll_sum(valid.astype(jnp.float64), w)
        m1 = roll_sum(az, w) / cnt
        m2 = roll_sum(az * az, w) / cnt - m1 ** 2
        m3 = roll_sum(az ** 3, w) / cnt - 3 * m1 * m2 - m1 ** 3
        m4 = (roll_sum(az ** 4, w) / cnt - 4 * m1 * m3 - 6 * m1 ** 2 * m2
              - m1 ** 4)
        kurt = jnp.where(m2 > 0, m4 / (m2 * m2) - 3.0, jnp.nan)
        out = warmup_nan(jnp.where(cnt > 0, kurt, jnp.nan), w)
        return self._prepare_output(x.index, out)


class TrendSlope(SISOTransform):
    """Rolling OLS slope of ln(close) in degrees (transforms.py:936).

    The reference loops scipy.linregress per window; the JAX tier uses the
    closed-form OLS slope over the fixed x-grid 0..w-1 via rolling sums.
    """

    def __init__(self, window: int = 24, input_col: str = "close"):
        super().__init__(input_col, f"trend_slope_{window}")
        self.window = window

    def _pd(self, x):
        series = np.log(x[self.requires[0]])
        result = pd.Series(np.nan, index=series.index, name=self.output_name)
        xv = np.arange(self.window)
        for i in range(self.window - 1, len(series)):
            wdat = series.iloc[i - self.window + 1:i + 1]
            if wdat.isna().any():
                continue
            slope, _, _, _, _ = stats.linregress(xv, wdat.values)
            result.iloc[i] = np.degrees(np.arctan(slope))
        return result

    def _jax(self, x):
        y = jnp.log(jnp.asarray(self._prepare_input(x), jnp.float64))
        w = self.window
        # slope = (sum k*y_k - mean(k)*sum y) / sum (k - mean k)^2 over the
        # window with k = 0..w-1; sum k*y = weighted rolling sum computable
        # as sum over offsets: use identity sum_{k} k*y[i-w+1+k]
        # = conv(y, kernel k). Implement via two rolling sums:
        #   S0 = sum y over window
        #   S1 = sum (index j)*y over window  -> k = j - (i-w+1)
        n = y.shape[0]
        j = jnp.arange(n, dtype=jnp.float64)
        s0 = roll_sum(y, w)
        s1 = roll_sum(j * y, w)
        i = jnp.arange(n, dtype=jnp.float64)
        sum_k_y = s1 - (i - w + 1) * s0
        kbar = (w - 1) / 2.0
        denom = w * (w * w - 1) / 12.0  # sum (k - kbar)^2
        slope = (sum_k_y - kbar * s0) / denom
        out = jnp.degrees(jnp.arctan(slope))
        out = warmup_nan(jnp.where(jnp.isnan(s0), jnp.nan, out), w)
        return self._prepare_output(x.index, out)


class ADX(MISOTransform):
    """Average Directional Index (transforms.py:991)."""

    def __init__(self, length: int = 14, input_cols=None):
        if input_cols is None:
            input_cols = ["high", "low", "close"]
        super().__init__(input_cols, f"adx_{length}")
        self.length = length

    def _pd(self, x):
        # genuine sequential numpy tier (reference _pd falls back to
        # numba): TR/±DM, Wilder running sums, DI/DX, final Wilder ADX
        h = x[self.requires[0]].to_numpy(np.float64)
        l = x[self.requires[1]].to_numpy(np.float64)
        c = x[self.requires[2]].to_numpy(np.float64)
        n, L = len(h), self.length
        adx = np.zeros(n)
        if n >= L + 1:
            pc = c[:-1]
            tr = np.maximum(h[1:] - l[1:],
                            np.maximum(np.abs(h[1:] - pc), np.abs(l[1:] - pc)))
            hd = h[1:] - h[:-1]
            ld = l[:-1] - l[1:]
            pdm = np.where((hd > ld) & (hd > 0), hd, 0.0)
            mdm = np.where((ld > hd) & (ld > 0), ld, 0.0)
            tr = np.concatenate([[0.0], tr])
            pdm = np.concatenate([[0.0], pdm])
            mdm = np.concatenate([[0.0], mdm])

            def wilder_sum(xv):
                out = np.zeros(n)
                s = xv[1:L + 1].sum()
                out[L] = s
                for i in range(L + 1, n):
                    s = s * (1.0 - 1.0 / L) + xv[i]
                    out[i] = s
                return out

            s_tr, s_pdm, s_mdm = wilder_sum(tr), wilder_sum(pdm), wilder_sum(mdm)
            idx = np.arange(n)
            valid = (idx >= L) & (s_tr > 0)
            with np.errstate(invalid="ignore", divide="ignore"):
                pdi = np.where(valid, 100.0 * s_pdm / np.where(s_tr > 0, s_tr, 1), 0.0)
                mdi = np.where(valid, 100.0 * s_mdm / np.where(s_tr > 0, s_tr, 1), 0.0)
            dsum = pdi + mdi
            dx = np.where((idx >= L) & (dsum > 0),
                          100.0 * np.abs(pdi - mdi) / np.where(dsum > 0, dsum, 1), 0.0)
            if n >= 2 * L:
                a = dx[L:2 * L].mean()
                adx[2 * L - 1] = a
                for i in range(2 * L, n):
                    a = ((L - 1) * a + dx[i]) / L
                    adx[i] = a
        return pd.Series(adx, index=x.index, name=self.output_name)

    def _jax(self, x):
        d = self._prepare_input(x)
        result = K.adx(d[self.requires[0]], d[self.requires[1]],
                       d[self.requires[2]], self.length)
        return self._prepare_output(x.index, result)


class MeanReversionZScore(SISOTransform):
    """(close - SMA)/rolling std (transforms.py:1033)."""

    def __init__(self, window: int = 48, input_col: str = "close"):
        super().__init__(input_col, f"mr_z_{window}")
        self.window = window

    def _pd(self, x):
        series = x[self.requires[0]]
        sma_v = series.rolling(window=self.window).mean()
        std = series.rolling(window=self.window).std()
        return pd.Series((series - sma_v) / std, index=series.index,
                         name=self.output_name)

    def _jax(self, x):
        arr = jnp.asarray(self._prepare_input(x), jnp.float64)
        w = self.window
        s = roll_sum(arr, w)
        s2 = roll_sum(arr * arr, w)
        mean = s / w
        var = (s2 - w * mean * mean) / (w - 1)
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        out = warmup_nan((arr - mean) / std, w)
        return self._prepare_output(x.index, out)


class DailyGap(SISOTransform):
    """Overnight UTC gap (transforms.py:1065). Calendar logic — host-side."""

    def __init__(self, input_col: str = "close"):
        super().__init__(input_col, "daily_gap")

    def _pd(self, x):
        series = x[self.requires[0]]
        result = pd.Series(np.nan, index=series.index, name=self.output_name)
        if not isinstance(series.index, pd.DatetimeIndex):
            raise ValueError("Input DataFrame must have a DatetimeIndex for DailyGap calculation")
        series = series.sort_index()
        midnight_close = series.resample("D").first()
        prev_2345_close = series.shift(1).resample("D").last()
        daily_gap = (midnight_close - prev_2345_close) / prev_2345_close
        for date, gap in daily_gap.items():
            if not np.isnan(gap):
                day_start = pd.Timestamp(date.year, date.month, date.day)
                if day_start in result.index:
                    result.loc[day_start] = gap
        return result

    def _jax(self, x):
        return self._pd(x)


class ORBBreak(MIMOTransform):
    """Opening-range breakout signals (transforms.py:1122). Host-side."""

    def __init__(self, input_cols=None):
        if input_cols is None:
            input_cols = ["high", "low", "close"]
        super().__init__(input_cols, ["orb_long", "orb_short"])

    def _pd(self, x):
        high = x[self.requires[0]]
        if not isinstance(high.index, pd.DatetimeIndex):
            raise ValueError("Input DataFrame must have a DatetimeIndex for ORB calculation")
        x = x.sort_index()
        orb_long = pd.Series(False, index=x.index, name=self.produces[0])
        orb_short = pd.Series(False, index=x.index, name=self.produces[1])
        for _, day_data in x.groupby(pd.Grouper(freq="D")):
            if len(day_data) == 0:
                continue
            first_ts = day_data.index[0]
            if first_ts.hour == 0 and first_ts.minute == 0:
                first_hour = day_data.iloc[:4]
                if len(first_hour) < 4:
                    continue
                or_high = first_hour[self.requires[0]].max()
                or_low = first_hour[self.requires[1]].min()
                rest = day_data.iloc[4:]
                closes = rest[self.requires[2]]
                orb_long.loc[closes.index[closes > or_high]] = True
                orb_short.loc[closes.index[closes < or_low]] = True
        return orb_long, orb_short

    def _jax(self, x):
        return self._pd(x)

    @property
    def output_name(self):
        return self.produces


class BarRate(SISOTransform):
    """Bars per hour in a trailing time window (transforms.py:1210)."""

    def __init__(self, window: pd.Timedelta, input_col: str = "close"):
        window_sec = window.total_seconds()
        window_min = window_sec / 60.0
        output_name = "bars_per_hour" if window_min.is_integer() else f"rate_{window_min}m"
        super().__init__(input_col, output_name)
        self.out_name = output_name
        self.window_sec = window_sec

    def _pd(self, x):
        if not isinstance(x.index, pd.DatetimeIndex):
            raise ValueError("Input DataFrame must have a DatetimeIndex for BarRate calculation")
        if not x.index.is_monotonic_increasing:
            x = x.sort_index()
        ones = pd.Series(1, index=x.index)
        result = ones.rolling(window=pd.Timedelta(seconds=self.window_sec),
                              closed="both").sum() / self.window_sec * 3600
        result.name = self.out_name
        return result

    def _jax(self, x):
        ts = jnp.asarray(self._get_timestamps(x))
        w_ns = jnp.int64(self.window_sec * 1e9)
        start = jnp.searchsorted(ts, ts - w_ns, side="left")
        count = jnp.arange(ts.shape[0]) - start + 1
        out = count.astype(jnp.float64) / self.window_sec * 3600.0
        return self._prepare_output(x.index, out)

    @property
    def output_name(self):
        return self.out_name


class CandleShape(MIMOTransform):
    """Wick/body ratios + vwap drift (transforms.py:1273)."""

    def __init__(self, input_cols=None):
        if input_cols is None:
            input_cols = ["open", "high", "low", "close", "vwap"]
        super().__init__(input_cols,
                         ["wick_up_ratio", "wick_dn_ratio", "body_ratio", "vwap_drift"])

    def _pd(self, x):
        o = x[self.requires[0]]
        h = x[self.requires[1]]
        l = x[self.requires[2]]
        c = x[self.requires[3]]
        v = x[self.requires[4]]
        rng = h - l + 1e-12
        max_oc = np.maximum(o, c)
        min_oc = np.minimum(o, c)
        outs = ((h - max_oc) / rng, (min_oc - l) / rng,
                (c - o).abs() / rng, (v - o) / o)
        named = []
        for s, nm in zip(outs, self.produces):
            s = pd.Series(s, index=o.index, name=nm)
            named.append(s)
        return tuple(named)

    def _jax(self, x):
        d = self._prepare_input(x)
        o = jnp.asarray(d[self.requires[0]], jnp.float64)
        h = jnp.asarray(d[self.requires[1]], jnp.float64)
        l = jnp.asarray(d[self.requires[2]], jnp.float64)
        c = jnp.asarray(d[self.requires[3]], jnp.float64)
        v = jnp.asarray(d[self.requires[4]], jnp.float64)
        rng = h - l + 1e-12
        max_oc = jnp.maximum(o, c)
        min_oc = jnp.minimum(o, c)
        return self._prepare_output(
            x.index,
            ((h - max_oc) / rng, (min_oc - l) / rng,
             jnp.abs(c - o) / rng, (v - o) / o))

    @property
    def output_name(self):
        return self.produces


class HurstExponent(SISOTransform):
    """Rolling Hurst exponent, aggregated-variance method (transforms.py:1341).

    The reference applies polyfit per window; the JAX tier exploits that
    the k-lag diff of the within-window cumsum equals the rolling k-sum of
    raw returns, so each tau_k is a windowed moment — fully vectorized.
    """

    _LAGS = (1, 2, 4, 8)

    def __init__(self, window: int = 24, input_col: str = "ret1"):
        super().__init__(input_col, f"hurst{window}")
        self.window = window

    @staticmethod
    def _hurst_window(series):
        y = series.cumsum().values
        lags = np.array([1, 2, 4, 8])
        taus = []
        for k in lags:
            if k < len(y):
                diff = y[k:] - y[:-k]
                taus.append(np.sqrt(np.var(diff)))
        taus = np.asarray(taus)
        if np.all(taus > 0):
            slope, _ = np.polyfit(np.log(lags), np.log(taus), 1)
            return slope
        return np.nan

    def _pd(self, x):
        series = x[self.requires[0]]
        result = series.rolling(window=self.window).apply(self._hurst_window,
                                                          raw=False)
        result.name = self.output_name
        return result

    def _jax(self, x):
        r = jnp.asarray(self._prepare_input(x), jnp.float64)
        w = self.window
        n = r.shape[0]
        lags = [k for k in self._LAGS if k < w]
        # k-lag diffs of the window cumsum = rolling k-sums of r
        log_taus = []
        for k in lags:
            d = roll_sum(r, k)  # d[i] = y_t - y_{t-k} within any window
            # var over the (w - k) in-window diff positions ending at i
            cntk = float(w - k)
            s1 = roll_sum(d, w - k)
            s2 = roll_sum(d * d, w - k)
            var = s2 / cntk - (s1 / cntk) ** 2
            tau = jnp.sqrt(jnp.maximum(var, 0.0))
            log_taus.append(jnp.log(tau))
        lx = jnp.log(jnp.asarray(lags, jnp.float64))
        ly = jnp.stack(log_taus, axis=0)  # (L, n)
        lxm = lx.mean()
        slope = ((lx[:, None] - lxm) * ly).sum(0) / ((lx - lxm) ** 2).sum()
        ok = jnp.isfinite(slope)
        out = warmup_nan(jnp.where(ok, slope, jnp.nan), w)
        return self._prepare_output(x.index, out)


class ApproximateEntropy(SISOTransform):
    """Rolling approximate entropy (transforms.py:1400).

    The reference delegates to the optional ``antropy`` package; the JAX
    tier implements Pincus ApEn (Chebyshev metric, self-matches included)
    directly with batched distance matrices.
    """

    def __init__(self, window: int = 24, m: int = 2, tolerance: float = 0.2,
                 input_col: str = "ret1"):
        super().__init__(input_col, f"apen{window}")
        self.window = window
        self.m = m
        self.tolerance = tolerance
        try:
            import antropy
            self.antropy = antropy
        except ImportError:
            logger.warning("antropy package not found; ApproximateEntropy _pd "
                           "backend unavailable (use backend='jax').")
            self.antropy = None

    def _pd(self, x):
        if self.antropy is None:
            raise ImportError("antropy package is required for ApproximateEntropy transform.")
        series = x[self.requires[0]]
        result = series.rolling(window=self.window).apply(
            lambda w: self.antropy.app_entropy(
                w.values, order=self.m, metric="chebyshev",
                tolerance=self.tolerance * np.std(w.values)),
            raw=False)
        result.name = self.output_name
        return result

    def _jax(self, x):
        arr = jnp.asarray(self._prepare_input(x), jnp.float64)
        w, m = self.window, self.m
        n = arr.shape[0]
        from .kernels._rolling import sliding_windows
        W = sliding_windows(arr, w)  # (n, w)

        def apen_one(win):
            r = self.tolerance * jnp.std(win)

            def phi(mm):
                nvec = w - mm + 1
                idx = jnp.arange(nvec)[:, None] + jnp.arange(mm)[None, :]
                emb = win[idx]  # (nvec, mm)
                dist = jnp.max(jnp.abs(emb[:, None, :] - emb[None, :, :]), axis=-1)
                cnt = jnp.sum(dist <= r, axis=1).astype(jnp.float64)
                return jnp.mean(jnp.log(cnt / nvec))
            return phi(m) - phi(m + 1)

        out = jax.lax.map(apen_one, W, batch_size=256)
        out = warmup_nan(out, w)
        return self._prepare_output(x.index, out)


class BarDurationEWMA(SISOTransform):
    """EWMA of inter-bar durations in seconds (transforms.py:1460)."""

    def __init__(self, span: int = 20, input_col: str = "close"):
        self.out_name = f"dur_ewma{span}"
        super().__init__(input_col, self.out_name)
        self.span = span

    def _pd(self, x):
        if not isinstance(x.index, pd.DatetimeIndex):
            raise ValueError("Input DataFrame must have a DatetimeIndex for BarDurationEWMA calculation")
        dur_s = x.index.to_series().diff().dt.total_seconds()
        result = dur_s.ewm(span=self.span, adjust=True).mean()
        result.name = self.out_name
        return result

    def _jax(self, x):
        ts = self._get_timestamps(x)
        dur = np.concatenate([[np.nan], np.diff(ts) / 1e9])
        # EWMA with NaN head: pandas skips the leading NaN; our scan-based
        # ewma poisons on NaN, so run it on the valid tail
        out = np.full(len(dur), np.nan)
        if len(dur) > 1:
            out[1:] = np.asarray(K.ewma(dur[1:], self.span))
        return self._prepare_output(x.index, out)

    @property
    def output_name(self):
        return self.out_name


class BarDuration(SISOTransform):
    """Inter-bar duration in seconds (transforms.py:1511)."""

    def __init__(self, periods=1, input_col: str = "close"):
        self.out_name = f"dur_{periods}bar"
        self.periods = periods
        super().__init__(input_col, self.out_name)

    def _pd(self, x):
        if not isinstance(x.index, pd.DatetimeIndex):
            raise ValueError("Input DataFrame must have a DatetimeIndex for BarDuration calculation")
        dur_s = x.index.to_series().diff(self.periods).dt.total_seconds()
        dur_s.name = self.out_name
        return dur_s

    def _jax(self, x):
        ts = jnp.asarray(self._get_timestamps(x))
        lag = jnp.roll(ts, self.periods)
        out = (ts - lag).astype(jnp.float64) / 1e9
        out = jnp.where(jnp.arange(ts.shape[0]) < self.periods, jnp.nan, out)
        return self._prepare_output(x.index, out)

    @property
    def output_name(self):
        return self.out_name


class BiPowerVariation(SISOTransform):
    """Jump-robust bi-power variation (transforms.py:1551)."""

    def __init__(self, window: int = 12, input_col: str = "ret1"):
        super().__init__(input_col, f"bv_{window}")
        self.window = window
        self.mu1_inv_sq = (np.pi / 2) ** 0.5

    def _pd(self, x):
        abs_r = x[self.requires[0]].abs()
        bv = self.mu1_inv_sq * abs_r.rolling(self.window + 1).apply(
            lambda w: (w[1:] * w[:-1]).sum(), raw=True)
        bv.name = self.output_name
        return bv

    def _jax(self, x):
        r = jnp.abs(jnp.asarray(self._prepare_input(x), jnp.float64))
        prod = r * jnp.concatenate([jnp.full((1,), jnp.nan), r[:-1]])
        out = self.mu1_inv_sq * roll_sum(prod, self.window)
        out = warmup_nan(out, self.window + 1)
        return self._prepare_output(x.index, out)


class DirRunLen(SISOTransform):
    """Consecutive same-sign return streak length (transforms.py:1605)."""

    def __init__(self, input_col: str = "ret1"):
        super().__init__(input_col, "dir_run_len")

    def _pd(self, x):
        # genuine pandas tier (the reference's is at transforms.py:1605);
        # preserves the kernel quirks: index 0 is always 0, index 1 never
        # starts a change vs itself, zero returns reset to 0
        s = x[self.requires[0]]
        sign = np.sign(s.to_numpy(np.float64))
        n = len(sign)
        if n == 0:
            return pd.Series(np.zeros(0, np.int8), index=x.index,
                             name=self.output_name)
        prev = np.roll(sign, 1)
        if n > 1:
            prev[1] = sign[1]
        idx = np.arange(n)
        change = (sign != prev) | (idx <= 1)
        start = np.maximum.accumulate(np.where(change, idx, 0))
        run = np.where(sign != 0, idx - start + 1, 0)
        run[0] = 0
        return pd.Series(run.astype(np.int8), index=x.index,
                         name=self.output_name)

    def _jax(self, x):
        arr = jnp.asarray(self._prepare_input(x), jnp.float64)
        n = arr.shape[0]
        if n == 0:
            return self._prepare_output(x.index, jnp.zeros((0,), jnp.int8))
        sign = jnp.sign(arr)
        idx = jnp.arange(n)
        prev = jnp.roll(sign, 1)
        # reference quirk: at i=1 the previous sign is sign(x[1]) itself
        prev = prev.at[1].set(sign[1]) if n > 1 else prev
        change = (sign != prev) | (idx <= 1)
        start = jax.lax.cummax(jnp.where(change, idx, 0))
        run = jnp.where(sign != 0, idx - start + 1, 0)
        run = run.at[0].set(0)
        return self._prepare_output(x.index, run.astype(jnp.int8))


class ExternalFunction(BaseTransform):
    """Wrap an external callable (by object or import path) as a transform.

    Parity: transforms.py:1668-1805 — enables TA-Lib/NumPy callables in
    pipelines with serialization support.
    """

    def __init__(self, func: Union[str, Callable],
                 input_cols: Union[str, Sequence],
                 output_cols: Union[str, Sequence, None] = None, *,
                 args: Optional[Sequence[Any]] = None,
                 kwargs: Optional[dict] = None,
                 pass_numpy: bool = False):
        if isinstance(func, str):
            func_path = func
            func_obj = None
            func_name = func.split(".")[-1]
        else:
            module = getattr(func, "__module__", None)
            name = getattr(func, "__name__", None)
            func_name = name or "external"
            func_path = f"{module}.{name}" if module and name else None
            func_obj = func

        produces = output_cols if output_cols is not None else f"ext_{func_name}"
        super().__init__(input_cols, produces)
        self._callable = func_obj
        self.func_path = func_path
        self.args = list(args) if args is not None else []
        self.kwargs = dict(kwargs) if kwargs is not None else {}
        self.pass_numpy = pass_numpy
        self._is_external_function = True

    @property
    def output_name(self):
        if isinstance(self.produces, list) and len(self.produces) == 1:
            return self.produces[0]
        return self.produces

    def _validate_input(self, x):
        if not isinstance(x, pd.DataFrame):
            raise TypeError("Input must be a pandas DataFrame")
        missing = [c for c in self.requires if c not in x.columns]
        if missing:
            raise ValueError(f"Missing required columns: {missing}")
        return True

    def _resolve_func(self) -> Callable:
        if self._callable is not None:
            return self._callable
        if not self.func_path:
            raise ValueError("ExternalFunction requires a callable or import path")
        module_name, attr = self.func_path.rsplit(".", 1)
        mod = __import__(module_name, fromlist=[attr])
        fn = getattr(mod, attr)
        if not callable(fn):
            raise TypeError(f"Imported object {self.func_path} is not callable")
        self._callable = fn
        return fn

    def __call__(self, x: pd.DataFrame, *, backend="jax"):
        self._validate_input(x)
        fn = self._resolve_func()
        index = x[self.requires[0]].index
        inputs = [x[c].to_numpy() if self.pass_numpy else x[c]
                  for c in self.requires]
        result = fn(*(inputs + list(self.args)), **self.kwargs)

        single_name = self.output_name if isinstance(self.output_name, str) \
            else self.produces[0]
        if isinstance(result, (tuple, list)):
            if not isinstance(self.produces, list) or len(result) != len(self.produces):
                raise ValueError(
                    f"ExternalFunction returned {len(result)} outputs, but produces={self.produces}")
            outs = []
            for name, item in zip(self.produces, result):
                if isinstance(item, pd.Series):
                    s = item.copy()
                    s.name = name
                else:
                    s = pd.Series(item, index=index, name=name)
                outs.append(s)
            return tuple(outs)
        if isinstance(result, pd.Series):
            s = result.copy()
            s.name = single_name
            return s
        return pd.Series(result, index=index, name=single_name)

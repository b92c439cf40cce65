"""Deep scenario matrix for feature kernels.

Mirrors the reference's scenario coverage in tests/features/test_atr.py,
test_vpin.py, test_variance_ratio.py, test_compute_returns.py,
test_time_cues.py and test_adx_core.py (semantics, not code): NaN
propagation, degenerate windows, perfect balance/imbalance, session
boundary membership, trend regimes, irregular-timestamp returns.
"""
import numpy as np
import pandas as pd
import pytest

import finmlkit_tpu.feature.kernels as K


class TestTrueRangeAndATR:
    def _ohlc(self, n=60, seed=0):
        r = np.random.default_rng(seed)
        close = 100 + np.cumsum(r.normal(0, 0.5, n))
        high = close + r.random(n)
        low = close - r.random(n)
        return high, low, close

    def test_true_range_first_element_high_minus_low(self):
        high, low, close = self._ohlc()
        tr = np.asarray(K.true_range(high, low, close))
        np.testing.assert_allclose(tr[0], high[0] - low[0], rtol=1e-12)

    def test_true_range_gap_dominates(self):
        # big gap up: TR driven by |high - prev_close|
        high = np.array([10.0, 20.0])
        low = np.array([9.0, 19.5])
        close = np.array([9.5, 19.8])
        tr = np.asarray(K.true_range(high, low, close))
        np.testing.assert_allclose(tr[1], 20.0 - 9.5, rtol=1e-12)

    def test_true_range_nan_propagation(self):
        high, low, close = self._ohlc()
        high[5] = np.nan
        close[10] = np.nan
        tr = np.asarray(K.true_range(high, low, close))
        assert np.isnan(tr[5])       # own high NaN
        assert np.isnan(tr[11])      # previous close NaN
        assert not np.isnan(tr[12])

    def test_atr_sma_nan_windows_excluded(self):
        high, low, close = self._ohlc()
        high[7] = np.nan
        a = np.asarray(K.atr(high, low, close, 5))
        # windows touching index 7 average over the remaining valid TRs
        assert np.all(np.isfinite(a[12:]))

    def test_atr_ema_seed_is_mean_of_first_window(self):
        high, low, close = self._ohlc(n=30, seed=3)
        w = 10
        a = np.asarray(K.atr(high, low, close, w, ema_based=True))
        tr = np.asarray(K.true_range(high, low, close))
        np.testing.assert_allclose(a[w - 1], np.nanmean(tr[:w]), rtol=1e-10)
        assert np.all(np.isnan(a[:w - 1]))

    def test_atr_ema_wilder_recurrence(self):
        high, low, close = self._ohlc(n=40, seed=4)
        w = 7
        a = np.asarray(K.atr(high, low, close, w, ema_based=True))
        tr = np.asarray(K.true_range(high, low, close))
        exp = np.nanmean(tr[:w])
        for i in range(w, 40):
            exp = ((w - 1) * exp + tr[i]) / w
            np.testing.assert_allclose(a[i], exp, rtol=1e-10)

    def test_atr_normalize_divides_by_midprice(self):
        high, low, close = self._ohlc(n=30, seed=5)
        w = 5
        raw = np.asarray(K.atr(high, low, close, w))
        norm = np.asarray(K.atr(high, low, close, w, normalize=True))
        mid = (high + low) / 2.0
        m = ~np.isnan(raw)
        np.testing.assert_allclose(norm[m], raw[m] / mid[m], rtol=1e-10)

    def test_atr_constant_prices_zero(self):
        n = 20
        flat = np.full(n, 50.0)
        a = np.asarray(K.atr(flat, flat, flat, 5))
        np.testing.assert_allclose(a[4:], 0.0, atol=1e-12)


class TestVPINScenarios:
    def test_perfect_balance_half(self):
        vb = np.full(50, 3.0)
        vs = np.full(50, 3.0)
        v = np.asarray(K.vpin(vb, vs, 10))
        # |vb-vs| = 0 -> vpin 0
        np.testing.assert_allclose(v[9:], 0.0, atol=1e-7)

    def test_perfect_imbalance_one(self):
        vb = np.full(50, 5.0)
        vs = np.zeros(50)
        v = np.asarray(K.vpin(vb, vs, 10))
        np.testing.assert_allclose(v[9:], 1.0, rtol=1e-6)

    def test_alternating_imbalance(self):
        vb = np.tile([4.0, 0.0], 25)
        vs = np.tile([0.0, 4.0], 25)
        v = np.asarray(K.vpin(vb, vs, 10))
        # every sample fully imbalanced -> ratio 1 regardless of direction
        np.testing.assert_allclose(v[9:], 1.0, rtol=1e-6)

    def test_zero_volume_window_nan(self):
        vb = np.zeros(30)
        vs = np.zeros(30)
        v = np.asarray(K.vpin(vb, vs, 5))
        assert np.all(np.isnan(v[4:]) | (v[4:] == 0.0) | np.isinf(v[4:])) \
            or np.all(~np.isfinite(v[4:]))

    def test_window_one_pointwise(self):
        r = np.random.default_rng(1)
        vb = r.random(40) + 0.1
        vs = r.random(40) + 0.1
        v = np.asarray(K.vpin(vb, vs, 1))
        exp = np.abs(vb - vs) / (vb + vs)
        np.testing.assert_allclose(v, exp.astype(np.float32), rtol=1e-5)

    def test_nan_invalidates_entire_window(self):
        vb = np.random.default_rng(2).random(60) + 0.5
        vs = np.random.default_rng(3).random(60) + 0.5
        vs[20] = np.nan
        v = np.asarray(K.vpin(vb, vs, 8))
        assert np.isnan(v[20:28]).all()
        assert np.isfinite(v[28:]).all()

    def test_window_32_large(self):
        r = np.random.default_rng(4)
        vb = r.lognormal(0, 1, 200)
        vs = r.lognormal(0, 1, 200)
        v = np.asarray(K.vpin(vb, vs, 32))
        imb = pd.Series(np.abs(vb - vs)).rolling(32).sum()
        tot = pd.Series(vb + vs).rolling(32).sum()
        np.testing.assert_allclose(v[31:], (imb / tot).values[31:].astype(
            np.float32), rtol=1e-5)
        assert np.all((v[31:] >= 0) & (v[31:] <= 1))


class TestVarianceRatioScenarios:
    def test_random_walk_near_one(self):
        r = np.random.default_rng(6)
        price = 100 * np.exp(np.cumsum(r.normal(0, 0.01, 4000)))
        vr = np.asarray(K.variance_ratio_1_4(price, 500))
        m = np.isfinite(vr)
        assert abs(np.nanmedian(vr[m]) - 1.0) < 0.25

    def test_strong_mean_reversion_above_one(self):
        # AR(1) level with negative autocorrelation: 4-bar variance is far
        # below 4x the 1-bar variance, so var1/(var4/4) rises above 1
        r = np.random.default_rng(7)
        n = 4000
        eps = r.normal(0, 0.01, n)
        lp = np.zeros(n)
        for i in range(1, n):
            lp[i] = -0.8 * lp[i - 1] + eps[i]
        price = 100 * np.exp(lp * 0.1)
        vr = np.asarray(K.variance_ratio_1_4(price, 500))
        assert np.nanmedian(vr[np.isfinite(vr)]) > 2.0

    def test_trending_below_one(self):
        # positively autocorrelated returns: 4-bar variance exceeds 4x the
        # 1-bar variance, pushing var1/(var4/4) below 1
        r = np.random.default_rng(8)
        n = 4000
        ret = np.zeros(n)
        eps = r.normal(0, 0.005, n)
        for i in range(1, n):
            ret[i] = 0.7 * ret[i - 1] + eps[i]
        price = 100 * np.exp(np.cumsum(ret * 0.1))
        vr = np.asarray(K.variance_ratio_1_4(price, 500))
        assert np.nanmedian(vr[np.isfinite(vr)]) < 0.7

    def test_log_vs_simple_agree_small_returns(self):
        r = np.random.default_rng(9)
        price = 100 * np.exp(np.cumsum(r.normal(0, 1e-4, 2000)))
        vl = np.asarray(K.variance_ratio_1_4(price, 300, ret_type="log"))
        vs = np.asarray(K.variance_ratio_1_4(price, 300, ret_type="simple"))
        m = np.isfinite(vl) & np.isfinite(vs)
        np.testing.assert_allclose(vl[m], vs[m], rtol=0.05)

    def test_rolling_variance_min_periods(self):
        # Reference semantics (core/volatility.py:440-478): results start
        # only at i >= window-1; min_periods counts the NaN-skipped valid
        # samples INSIDE full windows (unlike pandas, which also fills the
        # warmup head).
        x = np.array([1.0, 2.0, np.nan, 4.0, 5.0, 6.0])
        v = np.asarray(K.rolling_variance(x, 3, ddof=1, min_periods=2))
        assert np.isnan(v[:2]).all()
        # window [1,2,nan] -> valid [1,2] -> var 0.5; [2,nan,4] -> 2.0
        np.testing.assert_allclose(v[2:], [0.5, 2.0, 0.5, 1.0], rtol=1e-10)
        # min_periods=3 invalidates every window containing the NaN
        v3 = np.asarray(K.rolling_variance(x, 3, ddof=1, min_periods=3))
        assert np.isnan(v3[2:5]).all() and np.isfinite(v3[5])


class TestLaggedReturnsScenarios:
    def _ts(self, n, spacing_s=1.0):
        return (np.arange(n) * spacing_s * 1e9).astype(np.int64) + 10 ** 18

    def test_log_vs_simple(self):
        r = np.random.default_rng(10)
        price = 100 * np.exp(np.cumsum(r.normal(0, 0.001, 500)))
        ts = self._ts(500)
        lg = np.asarray(K.comp_lagged_returns(ts, price, 10.0, is_log=True))
        sp = np.asarray(K.comp_lagged_returns(ts, price, 10.0, is_log=False))
        m = np.isfinite(lg)
        np.testing.assert_allclose(lg[m], np.log1p(sp[m]), rtol=1e-9)

    def test_window_smaller_than_spacing_gives_nan_or_zero(self):
        # 0.5s lookback on 1s-spaced data: no earlier sample inside the
        # window -> the reference anchors to the latest ts <= t - w,
        # which is the previous sample
        price = np.array([100.0, 101.0, 102.0, 103.0])
        ts = self._ts(4)
        out = np.asarray(K.comp_lagged_returns(ts, price, 0.5, is_log=True))
        exp = np.log(price[1:] / price[:-1])
        np.testing.assert_allclose(out[1:], exp, rtol=1e-10)

    def test_irregular_timestamps_searchsorted_anchor(self):
        # uneven spacing: the anchor is the last sample at or before t-w
        ts = np.array([0, 1, 5, 6, 20], dtype=np.int64) * 10 ** 9 + 10 ** 18
        price = np.array([100.0, 110.0, 120.0, 130.0, 140.0])
        out = np.asarray(K.comp_lagged_returns(ts, price, 4.0, is_log=False))
        # t=5: t-w=1 -> anchor price 110; t=6: t-w=2 -> anchor 110;
        # t=20: t-w=16 -> anchor 130
        np.testing.assert_allclose(out[2], 120.0 / 110.0 - 1, rtol=1e-12)
        np.testing.assert_allclose(out[3], 130.0 / 110.0 - 1, rtol=1e-12)
        np.testing.assert_allclose(out[4], 140.0 / 130.0 - 1, rtol=1e-12)

    def test_nan_prices_propagate_pointwise(self):
        price = np.array([100.0, np.nan, 102.0, 103.0, 104.0])
        ts = self._ts(5)
        out = np.asarray(K.comp_lagged_returns(ts, price, 1.0, is_log=False))
        assert np.isnan(out[1])  # own price NaN
        assert np.isnan(out[2])  # anchor price NaN

    def test_head_has_no_anchor(self):
        price = np.linspace(100, 110, 20)
        ts = self._ts(20)
        out = np.asarray(K.comp_lagged_returns(ts, price, 5.0, is_log=False))
        assert np.isnan(out[0])
        assert np.isfinite(out[6:]).all()


class TestTimeCuesScenarios:
    def _cues(self, dt_strings):
        ts = pd.to_datetime(dt_strings).values.astype("datetime64[ns]")
        return [np.asarray(a) for a in K.time_cues(ts.astype(np.int64))]

    def test_session_boundary_membership(self):
        out = self._cues(["2024-03-04 06:59", "2024-03-04 07:00",
                          "2024-03-04 08:00", "2024-03-04 13:00",
                          "2024-03-04 15:00", "2024-03-04 20:59",
                          "2024-03-04 21:00"])
        asia, eu, us = out[4], out[5], out[6]
        # 06:59 asia only; 07:00 asia+eu overlap; 08:00 eu only;
        # 13:00 eu+us; 15:00 us only; 20:59 us; 21:00 none
        assert asia.tolist() == [True, True, False, False, False, False, False]
        assert eu.tolist() == [False, True, True, True, False, False, False]
        assert us.tolist() == [False, False, False, True, True, True, False]

    def test_transition_flags_only_at_session_opens(self):
        out = self._cues(["2024-03-04 00:00", "2024-03-04 00:01",
                          "2024-03-04 07:00", "2024-03-04 13:00",
                          "2024-03-04 14:00", "2024-03-04 21:00"])
        trans, top = out[7], out[8]
        assert trans.tolist() == [True, False, True, True, False, False]
        # 14:00 and 21:00 are top-of-hour but not session opens
        assert top.tolist() == [True, False, True, True, True, True]

    def test_day_of_week_cycle(self):
        # Thursday 1970-01-01 epoch -> day_week=3; Sunday wraps to 6
        days = ["1970-01-01", "2024-03-04", "2024-03-09", "2024-03-10"]
        out = self._cues(days)
        sin_dw, cos_dw = out[2], out[3]
        twopi = 2 * np.pi
        exp_days = [3, 0, 5, 6]  # Thu, Mon, Sat, Sun
        np.testing.assert_allclose(sin_dw, np.sin(twopi * np.array(exp_days) / 7),
                                   atol=1e-9)
        np.testing.assert_allclose(cos_dw, np.cos(twopi * np.array(exp_days) / 7),
                                   atol=1e-9)

    def test_time_of_day_quadrants(self):
        out = self._cues(["2024-03-04 00:00", "2024-03-04 06:00",
                          "2024-03-04 12:00", "2024-03-04 18:00"])
        sin_td, cos_td = out[0], out[1]
        np.testing.assert_allclose(sin_td, [0.0, 1.0, 0.0, -1.0], atol=1e-9)
        np.testing.assert_allclose(cos_td, [1.0, 0.0, -1.0, 0.0], atol=1e-9)


class TestADXScenarios:
    def _trend(self, n=120, slope=1.0, noise=0.0, seed=0):
        r = np.random.default_rng(seed)
        close = 100 + slope * np.arange(n) + r.normal(0, noise, n)
        high = close + 0.5 + (r.random(n) * noise if noise else 0.0)
        low = close - 0.5 - (r.random(n) * noise if noise else 0.0)
        return high, low, close

    def test_strong_trend_high_adx(self):
        high, low, close = self._trend(slope=2.0)
        a = np.asarray(K.adx(high, low, close, 14))
        assert a[-1] > 60.0

    def test_choppy_range_low_adx(self):
        n = 200
        t = np.arange(n)
        close = 100 + 2 * np.sin(t * np.pi / 3)  # fast oscillation
        high = close + 0.5
        low = close - 0.5
        a = np.asarray(K.adx(high, low, close, 14))
        assert a[-1] < np.asarray(
            K.adx(*self._trend(n=n, slope=2.0), 14))[-1]

    def test_bounded_zero_hundred(self):
        r = np.random.default_rng(13)
        n = 300
        close = 100 + np.cumsum(r.normal(0, 1, n))
        high = close + r.random(n)
        low = close - r.random(n)
        a = np.asarray(K.adx(high, low, close, 14))
        assert np.all(a >= 0.0) and np.all(a <= 100.0)

    def test_short_series_returns_zeros(self):
        high, low, close = self._trend(n=10)
        a = np.asarray(K.adx(high, low, close, 14))
        np.testing.assert_allclose(a, 0.0)

    def test_parameter_sensitivity_smoother_with_longer_window(self):
        high, low, close = self._trend(n=300, slope=0.5, noise=1.5, seed=14)
        a7 = np.asarray(K.adx(high, low, close, 7))
        a21 = np.asarray(K.adx(high, low, close, 21))
        # longer window -> smoother ADX path (smaller step-to-step moves)
        d7 = np.abs(np.diff(a7[60:]))
        d21 = np.abs(np.diff(a21[60:]))
        assert d21.mean() < d7.mean()


class TestBollingerScenarios:
    def test_percent_b_midpoint_half(self):
        # symmetric oscillation: last price at the mean -> %B ~ 0.5
        close = np.array([10.0, 12.0, 8.0, 12.0, 8.0, 10.0])
        b = np.asarray(K.bollinger_percent_b(close, 5, 2.0))
        assert 0.3 < b[-1] < 0.7

    def test_breakout_above_one(self):
        close = np.concatenate([np.full(10, 100.0) + np.tile([0.1, -0.1], 5),
                                [110.0]])
        b = np.asarray(K.bollinger_percent_b(close, 10, 2.0))
        assert b[-1] > 1.0

    def test_constant_window_nan(self):
        close = np.full(15, 42.0)
        b = np.asarray(K.bollinger_percent_b(close, 5, 2.0))
        assert np.isnan(b[6:]).all()  # zero bandwidth -> NaN

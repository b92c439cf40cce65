"""Feature kernel tests: dual-check vs pandas (the reference's `_pd`
backends) and sequential numpy emulations of the kernel semantics."""
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.feature import kernels as K


@pytest.fixture
def series(rng):
    n = 800
    price = 100 * np.exp(np.cumsum(rng.normal(0, 0.01, n)))
    volume = rng.lognormal(0, 1, n)
    return price, volume


@pytest.fixture
def ohlc(rng):
    n = 500
    close = 100 * np.exp(np.cumsum(rng.normal(0, 0.01, n)))
    high = close * np.exp(np.abs(rng.normal(0, 0.005, n)))
    low = close * np.exp(-np.abs(rng.normal(0, 0.005, n)))
    return high, low, close


class TestMovingAverages:
    def test_ewma_vs_pandas(self, series):
        price, _ = series
        got = np.asarray(K.ewma(price, 20))
        exp = pd.Series(price).ewm(span=20, adjust=True).mean().values
        np.testing.assert_allclose(got, exp, rtol=1e-9)

    def test_ewma_bad_span(self):
        with pytest.raises(ValueError):
            K.ewma(np.ones(10), 0)

    def test_sma_vs_pandas(self, series):
        price, _ = series
        got = np.asarray(K.sma(price, 10))
        exp = pd.Series(price).rolling(10).mean().values
        np.testing.assert_allclose(got, exp, rtol=1e-10)

    def test_sma_nan_isolation(self):
        x = np.arange(20.0)
        x[5] = np.nan
        got = np.asarray(K.sma(x, 3))
        assert np.isnan(got[5]) and np.isnan(got[7])
        assert np.isfinite(got[8])  # window [6,7,8] has no NaN


class TestVolatility:
    def test_ewms_vs_pandas(self, series):
        price, _ = series
        r = np.diff(np.log(price), prepend=np.nan)
        got = np.asarray(K.ewms(r, 30))
        exp = pd.Series(r).ewm(span=30, adjust=True).std(bias=False).values
        np.testing.assert_allclose(got[1:], exp[1:], rtol=1e-8)

    def test_ewms_span_one(self):
        assert np.isnan(np.asarray(K.ewms(np.ones(5), 1))).all()

    def test_true_range_vs_pandas(self, ohlc):
        high, low, close = ohlc
        got = np.asarray(K.true_range(high, low, close))
        pc = pd.Series(close).shift(1)
        exp = np.maximum(high - low,
                         np.maximum((pd.Series(high) - pc).abs(),
                                    (pd.Series(low) - pc).abs())).values
        np.testing.assert_allclose(got[1:], exp[1:], rtol=1e-12)
        assert got[0] == high[0] - low[0]

    def test_realized_vol(self, series):
        price, _ = series
        r = np.diff(np.log(price), prepend=np.nan)
        got = np.asarray(K.realized_vol(r, 20, True))
        exp = pd.Series(r).rolling(20).apply(
            lambda w: np.sqrt(np.nansum(w ** 2) / (w.notna().sum() - 1))
            if w.notna().sum() > 1 else np.nan, raw=False).values
        np.testing.assert_allclose(got[21:], exp[21:], rtol=1e-9)

    def test_bollinger_vs_pandas(self, series):
        price, _ = series
        got = np.asarray(K.bollinger_percent_b(price, 20, 2.0))
        s = pd.Series(price)
        mean = s.rolling(20).mean()
        sd = s.rolling(20).std()
        exp = ((s - (mean - 2 * sd)) / (4 * sd)).values
        np.testing.assert_allclose(got[19:], exp[19:], rtol=1e-7)

    def test_atr_sma_vs_pandas(self, ohlc):
        high, low, close = ohlc
        got = np.asarray(K.atr(high, low, close, 14))
        tr = np.asarray(K.true_range(high, low, close))
        exp = pd.Series(tr).rolling(14, min_periods=1).mean().values
        np.testing.assert_allclose(got[14:], exp[14:], rtol=1e-10)

    def test_atr_ema(self, ohlc):
        high, low, close = ohlc
        got = np.asarray(K.atr(high, low, close, 14, ema_based=True))
        # sequential emulation
        tr = np.asarray(K.true_range(high, low, close))
        exp = np.full_like(tr, np.nan)
        exp[13] = np.nanmean(tr[:14])
        for i in range(14, len(tr)):
            exp[i] = (13 * exp[i - 1] + tr[i]) / 14
        np.testing.assert_allclose(got[13:], exp[13:], rtol=1e-10)

    def test_rolling_variance_vs_pandas(self, series):
        price, _ = series
        r = np.diff(np.log(price), prepend=np.nan)
        r[50:55] = np.nan
        got = np.asarray(K.rolling_variance(r, 30, ddof=1, min_periods=1))
        exp = pd.Series(r).rolling(30, min_periods=1).var(ddof=1).values
        # our warm-up region differs (reference starts at window-1)
        np.testing.assert_allclose(got[30:], exp[30:], rtol=1e-7)

    def test_variance_ratio(self, series):
        price, _ = series
        got = np.asarray(K.variance_ratio_1_4(price, 50))
        assert np.isfinite(got[60:]).all()
        # random walk: ratio should hover near 1ish scale, sanity only
        assert 0.05 < np.nanmedian(got) < 5.0

    def test_ewmst_sequential(self, series):
        price, _ = series
        n = len(price)
        ts = (np.cumsum(np.random.default_rng(0).exponential(1.0, n)) * 1e9).astype(np.int64)
        r = np.diff(np.log(price), prepend=np.nan)
        got = np.asarray(K.ewmst(ts, r, half_life=60.0, sigma_floor=1e-12))
        # sequential emulation of volatility.py:139-219
        V = V2 = Sy = Syy = 0.0
        exp = np.full(n, np.nan)
        for i in range(1, n):
            dt = (ts[i] - ts[i - 1]) / 1e9
            a = 1.0 - np.exp(-dt / 60.0)
            om = 1.0 - a
            V = a + om * V
            V2 = a * a + om * om * V2
            if np.isnan(r[i]):
                Sy, Syy = om * Sy, om * Syy
            else:
                Sy = a * r[i] + om * Sy
                Syy = a * r[i] ** 2 + om * Syy
            if V > 0:
                mean = Sy / V
                var_raw = Syy / V - mean ** 2
                denom = V - V2 / V
                var = var_raw * V / denom if denom > 0 and var_raw > 0 else 0.0
                exp[i] = max(np.sqrt(var), 1e-12)
        np.testing.assert_allclose(got[1:], exp[1:], rtol=1e-8)


class TestMomentum:
    def test_roc(self, series):
        price, _ = series
        got = np.asarray(K.roc(price, 10))
        exp = (pd.Series(price).pct_change(10) * 100).values
        np.testing.assert_allclose(got[10:], exp[10:], rtol=1e-10)

    def test_rsi_sequential(self, series):
        price, _ = series
        w = 14
        got = np.asarray(K.rsi_wilder(price, w))
        # sequential emulation of momentum.py:25-65
        n = len(price)
        exp = np.full(n, np.nan)
        diff = np.diff(price)
        ag = np.mean(np.maximum(diff[:w], 0))
        al = np.mean(np.maximum(-diff[:w], 0))
        exp[w] = 100 - 100 / (1 + ag / al) if al > 0 else np.nan
        for i in range(w + 1, n):
            g = max(diff[i - 1], 0)
            l = max(-diff[i - 1], 0)
            ag = ((w - 1) * ag + g) / w
            al = ((w - 1) * al + l) / w
            exp[i] = 100 - 100 / (1 + ag / al) if al > 0 else np.nan
        np.testing.assert_allclose(got[w:], exp[w:], rtol=1e-9)

    def test_stoch_k_vs_pandas(self, ohlc):
        high, low, close = ohlc
        got = np.asarray(K.stoch_k(close, low, high, 14))
        lo = pd.Series(low).rolling(14).min()
        hi = pd.Series(high).rolling(14).max()
        exp = (100 * (pd.Series(close) - lo) / (hi - lo)).values
        np.testing.assert_allclose(got[13:], exp[13:], rtol=1e-10)


class TestTrend:
    def test_adx_sequential(self, ohlc):
        high, low, close = ohlc
        L = 14
        got = np.asarray(K.adx(high, low, close, L))
        # sequential emulation of trend.py:8-96
        size = len(high)
        tr = np.zeros(size)
        pdm = np.zeros(size)
        mdm = np.zeros(size)
        for i in range(1, size):
            tr[i] = max(high[i] - low[i], abs(high[i] - close[i - 1]),
                        abs(low[i] - close[i - 1]))
            hd = high[i] - high[i - 1]
            ld = low[i - 1] - low[i]
            pdm[i] = hd if (hd > ld and hd > 0) else 0
            mdm[i] = ld if (ld > hd and ld > 0) else 0
        st = np.zeros(size)
        sp = np.zeros(size)
        sm = np.zeros(size)
        st[L] = tr[1:L + 1].sum()
        sp[L] = pdm[1:L + 1].sum()
        sm[L] = mdm[1:L + 1].sum()
        for i in range(L + 1, size):
            st[i] = st[i - 1] - st[i - 1] / L + tr[i]
            sp[i] = sp[i - 1] - sp[i - 1] / L + pdm[i]
            sm[i] = sm[i - 1] - sm[i - 1] / L + mdm[i]
        pdi = np.zeros(size)
        mdi = np.zeros(size)
        for i in range(L, size):
            if st[i] > 0:
                pdi[i] = 100 * sp[i] / st[i]
                mdi[i] = 100 * sm[i] / st[i]
        dx = np.zeros(size)
        for i in range(L, size):
            if pdi[i] + mdi[i] > 0:
                dx[i] = 100 * abs(pdi[i] - mdi[i]) / (pdi[i] + mdi[i])
        adx = np.zeros(size)
        adx[2 * L - 1] = dx[L:2 * L].mean()
        for i in range(2 * L, size):
            adx[i] = (adx[i - 1] * (L - 1) + dx[i]) / L
        np.testing.assert_allclose(got, adx, rtol=1e-8, atol=1e-10)


class TestMisc:
    def test_lagged_returns(self, series):
        price, _ = series
        n = len(price)
        ts = (np.arange(n) * 1e9).astype(np.int64) + 10**18
        got = np.asarray(K.comp_lagged_returns(ts, price, 5.0, is_log=True))
        exp = np.log(price / pd.Series(price).shift(5).values)
        np.testing.assert_allclose(got[5:], exp[5:], rtol=1e-10)

    def test_zscore_vs_pandas(self, series):
        price, _ = series
        got = np.asarray(K.comp_zscore(price, 30, ddof=0))
        s = pd.Series(price)
        exp = ((s - s.rolling(30).mean()) / s.rolling(30).std(ddof=0)).values
        np.testing.assert_allclose(got[29:], exp[29:], rtol=1e-6)

    def test_burst_ratio_vs_pandas(self, series):
        _, volume = series
        got = np.asarray(K.comp_burst_ratio(volume, 21))
        med = pd.Series(volume).rolling(21).median()
        exp = (volume / med).values
        np.testing.assert_allclose(got[20:], exp[20:], rtol=1e-10)

    def test_pct_change(self, series):
        price, _ = series
        got = np.asarray(K.pct_change(price, 3))
        exp = pd.Series(price).pct_change(3).values
        np.testing.assert_allclose(got[3:], exp[3:], rtol=1e-10)

    def test_time_cues(self):
        ts = pd.date_range("2024-03-04 00:00", periods=48, freq="30min")
        out = K.time_cues(ts.values.astype("datetime64[ns]").astype(np.int64))
        sin_td, cos_td, sin_dw, cos_dw, asia, eu, us, trans, top = \
            (np.asarray(a) for a in out)
        assert sin_td[0] == pytest.approx(0.0)
        assert cos_td[0] == pytest.approx(1.0)
        # 2024-03-04 is a Monday -> day_week = 0
        assert sin_dw[0] == pytest.approx(0.0)
        assert asia[0] and not us[0]
        assert us[2 * 14] and eu[2 * 8]
        assert trans[0] and top[0] and not top[1]


class TestReversionVolume:
    def test_vwap_distance(self, series):
        price, volume = series
        got = np.asarray(K.vwap_distance(price, volume, 20, is_log=False))
        pv = pd.Series(price * volume).rolling(20).sum()
        v = pd.Series(volume).rolling(20).sum()
        exp = (price / (pv / v) - 1).values
        np.testing.assert_allclose(got[19:], exp[19:], rtol=1e-9)

    def test_flow_acceleration(self, series):
        _, volume = series
        got = np.asarray(K.comp_flow_acceleration(volume, 20, 5))
        rec = pd.Series(volume).rolling(5).sum()
        past = pd.Series(volume).rolling(20).sum() - rec
        exp = np.log((rec + 1e-12) / (past + 1e-12)).values
        np.testing.assert_allclose(got[19:], exp[19:], rtol=1e-9)

    def test_vpin(self, rng):
        vb = rng.lognormal(0, 1, 300)
        vs = rng.lognormal(0, 1, 300)
        vb[40] = np.nan
        got = np.asarray(K.vpin(vb, vs, 10))
        imb = pd.Series(np.abs(vb - vs)).rolling(10).sum()
        tot = pd.Series(vb + vs).rolling(10).sum()
        exp = (imb / tot).values
        # windows containing the NaN are invalidated
        assert np.isnan(got[40:50]).all()
        np.testing.assert_allclose(got[55:], exp[55:].astype(np.float32),
                                   rtol=1e-5)

    def test_pv_correlation_vs_pandas(self, series):
        price, volume = series
        got = np.asarray(K.rolling_price_volume_correlation(price, volume, 20))
        r = pd.Series(price).pct_change()
        exp = r.rolling(20).corr(pd.Series(volume)).values
        np.testing.assert_allclose(got[21:], exp[21:], rtol=1e-6)


class TestStructuralBreak:
    @staticmethod
    def _seq_csw_rolling(close, window, warmup):
        """Sequential emulation of structural_break/cusum.py."""
        y = np.log(np.asarray(close, dtype=np.float64))
        n = len(y)
        up = np.full(n, np.nan)
        down = np.full(n, np.nan)
        cu = np.full(n, np.nan)
        cd = np.full(n, np.nan)

        def max_s(yw, t, sig):
            mu = md = -1e-6
            cvu = cvd = 0.0
            if t < 1 or sig <= 0:
                return mu, md, cvu, cvd
            for nn in range(1, t - 1):
                dyn = yw[t] - yw[nn]
                den = sig * np.sqrt(t - nn)
                if den <= 1e-16:
                    continue
                su = max(0, dyn) / den
                sd = -min(0, dyn) / den
                if su > mu:
                    mu = su
                    cvu = np.sqrt(4.6 + np.log(t - nn))
                if sd > md:
                    md = sd
                    cvd = np.sqrt(4.6 + np.log(t - nn))
            return mu, md, cvu, cvd

        if n > window:
            for cur in range(window, n):
                s = cur - window
                yw = y[s:cur + 1]
                csd = np.cumsum(np.diff(yw) ** 2)
                if s == 0:
                    for t in range(warmup, len(yw)):
                        sig = np.sqrt(csd[t - 1] / (t - 1))
                        up[t], down[t], cu[t], cd[t] = max_s(yw, t, sig)
                else:
                    t = len(yw) - 1
                    sig = np.sqrt(csd[t - 1] / (t - 1))
                    up[cur], down[cur], cu[cur], cd[cur] = max_s(yw, t, sig)
        else:
            csd = np.cumsum(np.diff(y) ** 2)
            for t in range(warmup, n):
                sig = np.sqrt(csd[t - 1] / (t - 1))
                up[t], down[t], cu[t], cd[t] = max_s(y, t, sig)
        return up, down, cu, cd

    def test_rolling_vs_sequential(self, series):
        price, _ = series
        price = price[:300]
        got = [np.asarray(a) for a in
               K.cusum_test_rolling(price, window_size=100, warmup_period=30)]
        exp = self._seq_csw_rolling(price, 100, 30)
        for g, e, name in zip(got, exp, ["up", "down", "cu", "cd"]):
            np.testing.assert_allclose(g[30:], e[30:], rtol=1e-9,
                                       err_msg=name)

    def test_small_series(self):
        out = K.cusum_test_rolling(np.linspace(100, 110, 20), 100, 30)
        assert all(np.isnan(np.asarray(a)).all() for a in out)

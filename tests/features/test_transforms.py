"""Transform catalog tests: dual-backend (pd vs jax) equivalence — the
reference suite's core pattern for transforms — plus naming conventions."""
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.feature import transforms as T


@pytest.fixture
def bars(rng):
    n = 400
    idx = pd.date_range("2024-03-01", periods=n, freq="5min")
    close = 100 * np.exp(np.cumsum(rng.normal(0, 0.003, n)))
    high = close * np.exp(np.abs(rng.normal(0, 0.001, n)))
    low = close * np.exp(-np.abs(rng.normal(0, 0.001, n)))
    open_ = np.roll(close, 1)
    open_[0] = close[0]
    volume = rng.lognormal(1, 1, n)
    vb = volume * rng.uniform(0.3, 0.7, n)
    return pd.DataFrame({
        "open": open_, "high": high, "low": low, "close": close,
        "volume": volume, "vwap": (high + low + close) / 3,
        "volume_buy": vb, "volume_sell": volume - vb,
        "ret1": np.concatenate([[np.nan], np.diff(np.log(close))]),
    }, index=idx)


DUAL_BACKEND_CASES = [
    (lambda: T.Lag(3, "close"), "close_lag3"),
    (lambda: T.Return(2, "close", is_log=True), "close_ret2"),
    (lambda: T.PctChange(4, "close"), "close_pctc4"),
    (lambda: T.RSIWilder(14, "close"), "close_rsiw14"),
    (lambda: T.SMA(10, "close"), "close_sma10"),
    (lambda: T.EWMA(20, "close"), "close_ewma20"),
    (lambda: T.BollingerPercentB(20, 2.0, "close"), "close_bollb20"),
    (lambda: T.RealizedVolatility(20, False, "ret1"), "ret1_rv20"),
    (lambda: T.VPIN(16), "vpin_16"),
    (lambda: T.PriceVolumeCorrelation(20), "corr_pv_20"),
    (lambda: T.MeanReversionZScore(30, "close"), "close_mr_z_30"),
    (lambda: T.KurtosisTransform(30, "ret1"), "ret1_kurt_30"),
    (lambda: T.TrendSlope(24, "close"), "close_trend_slope_24"),
    (lambda: T.BiPowerVariation(12, "ret1"), "ret1_bv_12"),
    (lambda: T.BarDuration(1, "close"), "dur_1bar"),
    (lambda: T.BarRate(pd.Timedelta(minutes=30), "close"), "bars_per_hour"),
    (lambda: T.HurstExponent(32, "ret1"), "ret1_hurst32"),
    # the 15 transforms whose reference _pd delegates to numba now have
    # genuine pandas tiers here (exceeding the reference) — full sweep:
    (lambda: T.ReturnT(pd.Timedelta(minutes=10), is_log=True,
                       input_col="close"), "close_ret600.0s"),
    (lambda: T.ROC(5, "close"), "close_roc5"),
    (lambda: T.StochK(14), "stochk14"),
    (lambda: T.EWMST(pd.Timedelta(minutes=30), "ret1"), "ret1_ewms1800.0s"),
    (lambda: T.ZScore(20, "close"), "close_z20"),
    (lambda: T.BurstRatio(20, "volume"), "volume_burst20"),
    (lambda: T.VWAPDistance(20), "vwapd20"),
    (lambda: T.ParkinsonRange(), "parkrange"),
    (lambda: T.FlowAcceleration(20, 5, "volume"), "volume_flowacc_20_5"),
    (lambda: T.ATR(14), "atr14"),
    (lambda: T.ATR(10, ema_based=True, normalize=True), "atr10_ema_norm"),
    (lambda: T.VarianceRatio14(32, "close"), "close_var_ratio_1_4_32"),
    (lambda: T.ADX(14), "adx_14"),
]


class TestDualBackendMultiOutput:
    """pd vs jax for the multi-output transforms of the 15-delegation set."""

    def test_time_cues(self, bars):
        t = T.TimeCues("close")
        out_pd = t(bars, backend="pd")
        out_jax = t(bars, backend="jax")
        assert len(out_pd) == len(out_jax) == 9
        for a, b in zip(out_pd, out_jax):
            np.testing.assert_allclose(np.asarray(a, np.float64),
                                       np.asarray(b, np.float64),
                                       rtol=1e-10, atol=1e-12, err_msg=a.name)

    def test_cusum_test(self, bars):
        t = T.CUSUMTest(window_size=40, warmup_period=20, input_col="close")
        out_pd = t(bars, backend="pd")
        out_jax = t(bars, backend="jax")
        for a, b in zip(out_pd, out_jax):
            av = np.asarray(a, np.float64)
            bv = np.asarray(b, np.float64)
            m = np.isnan(av)
            assert (m == np.isnan(bv)).all(), a.name
            np.testing.assert_allclose(av[~m], bv[~m], rtol=1e-8,
                                       atol=1e-10, err_msg=a.name)

    def test_dir_run_len_pd(self, bars):
        t = T.DirRunLen("ret1")
        np.testing.assert_array_equal(np.asarray(t(bars, backend="pd")),
                                      np.asarray(t(bars, backend="jax")))


class TestDualBackend:
    @pytest.mark.parametrize("make,name", DUAL_BACKEND_CASES,
                             ids=[n for _, n in DUAL_BACKEND_CASES])
    def test_pd_jax_agree(self, bars, make, name):
        t = make()
        res_pd = t(bars, backend="pd")
        res_jax = t(bars, backend="jax")
        assert res_jax.name == name
        a = np.asarray(res_pd, dtype=np.float64)
        b = np.asarray(res_jax, dtype=np.float64)
        mask = ~(np.isnan(a) | np.isnan(b))
        assert mask.sum() > len(a) // 2, "too few comparable points"
        np.testing.assert_allclose(a[mask], b[mask], rtol=1e-5, atol=1e-8)
        # NaN patterns must agree except possibly at warm-up boundary
        disagree = np.isnan(a) != np.isnan(b)
        assert disagree.sum() <= 2, f"NaN mismatch at {np.flatnonzero(disagree)[:10]}"


class TestShapes:
    def test_time_cues_nine_outputs(self, bars):
        t = T.TimeCues("close")
        out = t(bars, backend="jax")
        assert len(out) == 9
        assert out[0].name == "sin_td"  # TimeCues emits bare names

    def test_cusum_test_outputs(self, bars):
        t = T.CUSUMTest(window_size=50, warmup_period=30, input_col="close")
        out = t(bars, backend="jax")
        assert len(out) == 6
        names = [s.name for s in out]
        assert "cumote_up50_score" in names
        assert "cumote_up50_age" in names
        ages = out[4]
        assert (np.asarray(ages) <= 144).all()

    def test_candle_shape(self, bars):
        t = T.CandleShape()
        out_pd = t(bars, backend="pd")
        out_jax = t(bars, backend="jax")
        for a, b in zip(out_pd, out_jax):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)
        ratios = np.asarray(out_jax[0]) + np.asarray(out_jax[1]) + np.asarray(out_jax[2])
        assert (ratios <= 1.0 + 1e-9).all()

    def test_stochk_atr_adx(self, bars):
        for t in (T.StochK(14), T.ATR(14), T.ADX(14)):
            out = t(bars, backend="jax")
            assert len(out) == len(bars)

    def test_identity(self, bars):
        t = T.Identity("close")
        out = t(bars)
        np.testing.assert_array_equal(out.values, bars["close"].values)

    def test_dir_run_len(self, bars):
        t = T.DirRunLen("ret1")
        out = np.asarray(t(bars, backend="jax"))
        # sequential emulation of transforms.py:1636-1664
        x = bars["ret1"].values
        n = len(x)
        exp = np.zeros(n, dtype=np.int8)
        prev = np.sign(x[1])
        cur = 0
        for i in range(1, n):
            s = np.sign(x[i])
            if s == prev and s != 0:
                cur += 1
                exp[i] = cur
            else:
                cur = 1 if s != 0 else 0
                exp[i] = cur
            prev = s
        np.testing.assert_array_equal(out, exp)

    def test_external_function(self, bars):
        t = T.ExternalFunction("numpy.log", input_cols="close",
                               output_cols="log_close", pass_numpy=True)
        out = t(bars)
        assert out.name == "log_close"
        np.testing.assert_allclose(out.values, np.log(bars["close"].values))

    def test_ewmst_runs(self, bars):
        t = T.EWMST(pd.Timedelta(minutes=30), "ret1")
        out = t(bars, backend="jax")
        assert out.name == "ret1_ewms1800.0s"
        assert np.isfinite(np.asarray(out)[5:]).all()

    def test_returnt(self, bars):
        t = T.ReturnT(pd.Timedelta(minutes=10), is_log=True, input_col="close")
        out = np.asarray(t(bars, backend="jax"))
        # 5-min regular grid: 10-min window = 2-bar log return
        exp = np.log(bars["close"] / bars["close"].shift(2)).values
        np.testing.assert_allclose(out[3:], exp[3:], rtol=1e-10)

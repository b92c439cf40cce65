"""Deep scenario matrix for the Chu-Stinchcombe-White CUSUM test kernels.

Mirrors the reference's tests/structural_breaks/test_cusum.py coverage
(semantics, not code): flat vs trending vs breaking series, one-sided
statistic separation, critical-value formula, developing vs rolling
agreement on the expanding head, last-point consistency
(/root/reference/finmlkit/feature/core/structural_break/cusum.py).
"""
import numpy as np
import pytest

import finmlkit_tpu.feature.kernels as K


def _gbm(n, mu=0.0, sigma=1e-3, seed=0, p0=100.0):
    r = np.random.default_rng(seed)
    return p0 * np.exp(np.cumsum(r.normal(mu, sigma, n)))


class TestStatisticBehavior:
    def test_upward_break_fires_up_statistic(self):
        # quiet stretch then a strong upward shift: S_up must exceed its
        # critical value after the break while S_down stays below
        quiet = _gbm(150, sigma=2e-4, seed=1)
        shifted = quiet[-1] * np.exp(np.linspace(0, 0.05, 50))
        price = np.concatenate([quiet, shifted])
        up, down, cu, cd = [np.asarray(a) for a in
                            K.cusum_test_rolling(price, 300, 30)]
        tail = slice(170, 200)
        assert np.nanmax(up[tail] - cu[tail]) > 0
        assert np.nanmax(down[tail] - cd[tail]) <= 0

    def test_downward_break_fires_down_statistic(self):
        quiet = _gbm(150, sigma=2e-4, seed=2)
        shifted = quiet[-1] * np.exp(np.linspace(0, -0.05, 50))
        price = np.concatenate([quiet, shifted])
        up, down, cu, cd = [np.asarray(a) for a in
                            K.cusum_test_rolling(price, 300, 30)]
        tail = slice(170, 200)
        assert np.nanmax(down[tail] - cd[tail]) > 0
        assert np.nanmax(up[tail] - cu[tail]) <= 0

    def test_stationary_series_no_break(self):
        # pure noise: statistics stay near/below critical values
        price = _gbm(400, sigma=5e-4, seed=3)
        up, down, cu, cd = [np.asarray(a) for a in
                            K.cusum_test_rolling(price, 200, 30)]
        m = np.isfinite(up)
        # at 95%-style critical values occasional grazes are fine; assert
        # no sustained exceedance
        frac_up = np.mean((up[m] - cu[m]) > 0)
        frac_dn = np.mean((down[m] - cd[m]) > 0)
        assert frac_up < 0.15 and frac_dn < 0.15

    def test_statistics_nonnegative_where_finite(self):
        price = _gbm(300, seed=4)
        up, down, cu, cd = [np.asarray(a) for a in
                            K.cusum_test_rolling(price, 150, 30)]
        for a in (up, down):
            m = np.isfinite(a)
            assert np.all(a[m] >= -1e-6)
        # critical values follow sqrt(4.6 + log(t-n)) >= sqrt(4.6) when set
        for c in (cu, cd):
            m = np.isfinite(c) & (c > 0)
            assert np.all(c[m] >= np.sqrt(4.6) - 1e-9)

    def test_warmup_region_nan(self):
        price = _gbm(200, seed=5)
        up, *_ = [np.asarray(a) for a in K.cusum_test_rolling(price, 100, 40)]
        assert np.isnan(up[:40]).all()
        assert np.isfinite(up[45:100]).any()


class TestVariantConsistency:
    def test_developing_matches_rolling_expanding_head(self):
        # inside the first window the rolling variant IS the expanding
        # (developing) test — the two must agree exactly there
        price = _gbm(180, seed=6)
        r = [np.asarray(a) for a in K.cusum_test_rolling(price, 400, 30)]
        d = [np.asarray(a) for a in K.cusum_test_developing(price, 30)]
        for a, b, name in zip(r, d, ["up", "down", "cu", "cd"]):
            np.testing.assert_allclose(a, b, rtol=1e-10, equal_nan=True,
                                       err_msg=name)

    def test_last_matches_developing_final_point(self):
        price = _gbm(160, seed=7)
        d = [np.asarray(a) for a in K.cusum_test_developing(price, 30)]
        last = [float(np.asarray(a)) for a in K.cusum_test_last(price)]
        np.testing.assert_allclose(last[0], d[0][-1], rtol=1e-10)
        np.testing.assert_allclose(last[1], d[1][-1], rtol=1e-10)

    def test_rolling_window_restricts_lookback(self):
        # a level shift far outside the window must not keep firing the
        # statistic once the window has rolled past it
        lo = _gbm(100, sigma=1e-4, seed=8)
        hi = lo[-1] * 1.05 * _gbm(400, sigma=1e-4, seed=9, p0=1.0)
        price = np.concatenate([lo, hi])
        up, down, cu, cd = [np.asarray(a) for a in
                            K.cusum_test_rolling(price, 80, 20)]
        # long after the shift, within-window data is homogeneous again
        tail = slice(300, 500)
        assert np.nanmean((up[tail] - cu[tail]) > 0) < 0.1

    def test_scale_invariance_of_log_statistic(self):
        # the test runs on log prices: scaling prices by a constant
        # changes nothing
        price = _gbm(250, seed=10)
        a = [np.asarray(x) for x in K.cusum_test_rolling(price, 120, 30)]
        b = [np.asarray(x) for x in K.cusum_test_rolling(price * 37.5, 120, 30)]
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=1e-9, equal_nan=True)

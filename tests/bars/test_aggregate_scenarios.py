"""Deep scenario matrix for bar aggregations.

Mirrors the scenario coverage of the reference's
tests/bars/test_comp_ohlcv.py, test_comp_bar_directional_features.py and
test_bar_trade_size_features.py (semantics, not code): single-trade
bars, consecutive empty bars, zero volumes, monotone/volatile paths,
median parity on even/odd counts, spread sign-change quirks, cum
imbalance extrema init values, p95/Gini/block-volume formulas.
"""
import numpy as np
import jax.numpy as jnp

from finmlkit_tpu.bar.aggregate import (
    comp_bar_ohlcv,
    comp_bar_directional_features,
    comp_bar_trade_size_features,
)


def _ohlcv(prices, amounts, ci):
    out = comp_bar_ohlcv(jnp.asarray(prices, jnp.float64),
                         jnp.asarray(amounts, jnp.float32),
                         jnp.asarray(ci, jnp.int64))
    return {k: np.asarray(v) for k, v in out.items()}


def _direc(prices, amounts, ci, sides):
    out = comp_bar_directional_features(
        jnp.asarray(prices, jnp.float64), jnp.asarray(amounts, jnp.float32),
        jnp.asarray(ci, jnp.int64), jnp.asarray(sides, jnp.int8))
    return {k: np.asarray(v) for k, v in out.items()}


def _tsize(amounts, theta, ci, mult=5.0):
    out = comp_bar_trade_size_features(
        jnp.asarray(amounts, jnp.float32), jnp.asarray(theta, jnp.float64),
        jnp.asarray(ci, jnp.int64), mult)
    return {k: np.asarray(v) for k, v in out.items()}


class TestOhlcvScenarios:
    def test_single_trade_per_bar(self):
        prices = np.array([10.0, 11.0, 12.0, 13.0])
        amounts = np.ones(4, np.float32)
        ci = np.array([-1, 0, 1, 2, 3])
        out = _ohlcv(prices, amounts, ci)
        for k in ("open", "high", "low", "close", "vwap"):
            np.testing.assert_allclose(out[k], prices)
        np.testing.assert_array_equal(out["trades"], 1)
        np.testing.assert_allclose(out["median_trade_size"], 1.0)

    def test_ascending_prices(self):
        prices = np.arange(1.0, 11.0)
        amounts = np.ones(10, np.float32)
        ci = np.array([-1, 4, 9])
        out = _ohlcv(prices, amounts, ci)
        np.testing.assert_allclose(out["open"], [1.0, 6.0])
        np.testing.assert_allclose(out["high"], [5.0, 10.0])
        np.testing.assert_allclose(out["low"], [1.0, 6.0])
        np.testing.assert_allclose(out["close"], [5.0, 10.0])

    def test_descending_prices(self):
        prices = np.arange(10.0, 0.0, -1.0)
        amounts = np.ones(10, np.float32)
        ci = np.array([-1, 4, 9])
        out = _ohlcv(prices, amounts, ci)
        np.testing.assert_allclose(out["open"], [10.0, 5.0])
        np.testing.assert_allclose(out["high"], [10.0, 5.0])
        np.testing.assert_allclose(out["low"], [6.0, 1.0])
        np.testing.assert_allclose(out["close"], [6.0, 1.0])

    def test_volatile_path_extrema_inside_bar(self):
        prices = np.array([100.0, 130.0, 80.0, 95.0])
        amounts = np.array([1, 2, 3, 4], np.float32)
        ci = np.array([-1, 3])
        out = _ohlcv(prices, amounts, ci)
        np.testing.assert_allclose(out["open"], [100.0])
        np.testing.assert_allclose(out["high"], [130.0])
        np.testing.assert_allclose(out["low"], [80.0])
        np.testing.assert_allclose(out["close"], [95.0])
        vwap = (prices * amounts).sum() / amounts.sum()
        np.testing.assert_allclose(out["vwap"], [vwap], rtol=1e-12)

    def test_consecutive_empty_bars_carry_close(self):
        prices = np.array([50.0, 51.0])
        amounts = np.ones(2, np.float32)
        # bars 1..3 empty (duplicate close indices)
        ci = np.array([-1, 0, 0, 0, 0, 1])
        out = _ohlcv(prices, amounts, ci)
        for b in (1, 2, 3):
            for k in ("open", "high", "low", "close"):
                np.testing.assert_allclose(out[k][b], 50.0)
            assert out["volume"][b] == 0.0
            assert out["vwap"][b] == 0.0
            assert out["trades"][b] == 0
            assert out["median_trade_size"][b] == 0.0
        np.testing.assert_allclose(out["close"][4], 51.0)

    def test_zero_volume_trades(self):
        prices = np.array([10.0, 10.5, 11.0])
        amounts = np.zeros(3, np.float32)
        ci = np.array([-1, 2])
        out = _ohlcv(prices, amounts, ci)
        assert out["volume"][0] == 0.0
        assert out["vwap"][0] == 0.0  # guarded division
        assert out["trades"][0] == 3

    def test_extreme_volume_magnitudes(self):
        prices = np.array([100.0, 100.0])
        amounts = np.array([1e-6, 1e6], np.float32)
        ci = np.array([-1, 1])
        out = _ohlcv(prices, amounts, ci)
        np.testing.assert_allclose(out["vwap"], [100.0], rtol=1e-6)
        np.testing.assert_allclose(
            out["volume"], np.float32(1e-6) + np.float32(1e6), rtol=1e-6)

    def test_median_even_count_interpolates(self):
        amounts = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
        out = _ohlcv(np.full(4, 10.0), amounts, np.array([-1, 3]))
        np.testing.assert_allclose(out["median_trade_size"], [2.5])

    def test_median_odd_count(self):
        amounts = np.array([5.0, 1.0, 3.0], np.float32)
        out = _ohlcv(np.full(3, 10.0), amounts, np.array([-1, 2]))
        np.testing.assert_allclose(out["median_trade_size"], [3.0])

    def test_median_identical_sizes(self):
        amounts = np.full(7, 0.25, np.float32)
        out = _ohlcv(np.full(7, 10.0), amounts, np.array([-1, 6]))
        np.testing.assert_allclose(out["median_trade_size"], [0.25])

    def test_single_bar_whole_stream(self):
        r = np.random.default_rng(0)
        prices = 100 + r.normal(0, 1, 50).cumsum()
        amounts = (r.random(50) + 0.1).astype(np.float32)
        ci = np.array([-1, 49])
        out = _ohlcv(prices, amounts, ci)
        np.testing.assert_allclose(out["open"], [prices[0]])
        np.testing.assert_allclose(out["high"], [prices.max()])
        np.testing.assert_allclose(out["low"], [prices.min()])
        np.testing.assert_allclose(out["close"], [prices[-1]])
        np.testing.assert_allclose(
            out["median_trade_size"], [np.median(amounts)], rtol=1e-6)

    def test_floating_point_paranoia(self):
        # prices differing at the 1e-10 level keep exact f64 OHLC
        base = 12345.6789
        prices = base + np.array([0.0, 1e-10, -1e-10, 5e-11])
        out = _ohlcv(prices, np.ones(4, np.float32), np.array([-1, 3]))
        assert out["high"][0] == prices.max()
        assert out["low"][0] == prices.min()

    def test_invariants_random_large(self):
        r = np.random.default_rng(42)
        n = 20000
        prices = 100 * np.exp(np.cumsum(r.normal(0, 1e-4, n)))
        amounts = (r.lognormal(-2, 1, n)).astype(np.float32)
        closes = np.sort(r.choice(np.arange(10, n - 1), 97, replace=False))
        ci = np.concatenate([[-1], closes, [n - 1]]).astype(np.int64)
        out = _ohlcv(prices, amounts, ci)
        nb = len(ci) - 1
        assert out["open"].shape == (nb,)
        assert np.all(out["high"] >= np.maximum(out["open"], out["close"]) - 1e-12)
        assert np.all(out["low"] <= np.minimum(out["open"], out["close"]) + 1e-12)
        # vwap inside [low, high] for non-empty bars
        ne = out["trades"] > 0
        assert np.all(out["vwap"][ne] >= out["low"][ne] - 1e-9)
        assert np.all(out["vwap"][ne] <= out["high"][ne] + 1e-9)
        # total volume conserved (start-exclusive: trade 0 belongs to no bar
        # only if ci[0] == -1 includes it; here (ci[0], ci[-1]] covers all)
        np.testing.assert_allclose(out["volume"].sum(),
                                   amounts.sum(), rtol=1e-5)
        assert int(out["trades"].sum()) == n


def _direc_oracle(prices, amounts, ci, sides):
    """Sequential oracle with the reference's quirk semantics
    (bar/base.py:409-546): spread vs global previous trade, single-trade
    bars vs side 0, extrema init +/-1e9 tracked only on nonzero sides."""
    nb = len(ci) - 1
    out = {k: np.zeros(nb) for k in
           ("tb", "ts", "vb", "vs", "db", "ds", "mean_sp", "max_sp",
            "ctmin", "ctmax", "cvmin", "cvmax", "cdmin", "cdmax")}
    for b in range(nb):
        lo, hi = ci[b], ci[b + 1]
        ct = cv = cd = 0.0
        ctmin = cvmin = cdmin = 1e9
        ctmax = cvmax = cdmax = -1e9
        n_tr = hi - lo
        cum_sp = 0.0
        mx_sp = 0.0
        for j in range(lo + 1, hi + 1):
            s = int(sides[j])
            a = float(amounts[j])
            d = prices[j] * a
            if s == 1:
                out["tb"][b] += 1
                out["vb"][b] += a
                out["db"][b] += d
            elif s == -1:
                out["ts"][b] += 1
                out["vs"][b] += a
                out["ds"][b] += d
            prev_side = 0 if n_tr == 1 else int(sides[j - 1])
            prev_price = prices[j - 1]  # wraps at j=0 like jnp.roll
            if n_tr == 1:
                prev_price = prices[j - 1]
            if s != prev_side:
                sp = abs(prices[j] - prev_price)
                cum_sp += sp
                mx_sp = max(mx_sp, sp)
            if s != 0:
                ct += s
                cv += s * a
                cd += s * d
                ctmin, ctmax = min(ctmin, ct), max(ctmax, ct)
                cvmin, cvmax = min(cvmin, cv), max(cvmax, cv)
                cdmin, cdmax = min(cdmin, cd), max(cdmax, cd)
        tot = out["tb"][b] + out["ts"][b]
        out["mean_sp"][b] = cum_sp / tot if tot > 0 else np.nan
        out["max_sp"][b] = mx_sp
        out["ctmin"][b], out["ctmax"][b] = ctmin, ctmax
        out["cvmin"][b], out["cvmax"][b] = cvmin, cvmax
        out["cdmin"][b], out["cdmax"][b] = cdmin, cdmax
    return out


class TestDirectionalScenarios:
    def test_all_buys(self):
        prices = np.array([10.0, 10.1, 10.2])
        amounts = np.array([1, 2, 3], np.float32)
        sides = np.ones(3, np.int8)
        out = _direc(prices, amounts, np.array([-1, 2]), sides)
        assert out["ticks_buy"][0] == 3 and out["ticks_sell"][0] == 0
        np.testing.assert_allclose(out["volume_buy"], [6.0])
        np.testing.assert_allclose(out["volume_sell"], [0.0])
        # cum ticks rise 1,2,3 -> min 1 max 3
        assert out["cum_ticks_min"][0] == 1
        assert out["cum_ticks_max"][0] == 3

    def test_alternating_sides_spread(self):
        prices = np.array([10.0, 10.2, 10.1, 10.4])
        amounts = np.ones(4, np.float32)
        sides = np.array([1, -1, 1, -1], np.int8)
        out = _direc(prices, amounts, np.array([-1, 3]), sides)
        # every trade changes sign; j=0 wraps to prices[-1]=10.4
        spreads = [abs(10.0 - 10.4), 0.2, 0.1, 0.3]
        np.testing.assert_allclose(out["mean_spread"],
                                   [np.mean(spreads)], rtol=1e-6)
        np.testing.assert_allclose(out["max_spread"], [max(spreads)],
                                   rtol=1e-6)

    def test_empty_bar_conventions(self):
        prices = np.array([10.0, 10.5])
        amounts = np.ones(2, np.float32)
        sides = np.array([1, -1], np.int8)
        ci = np.array([-1, 1, 1])  # bar 1 empty
        out = _direc(prices, amounts, ci, sides)
        assert np.isnan(out["mean_spread"][1])
        assert out["max_spread"][1] == 0.0
        assert out["cum_ticks_max"][1] == -1e9  # untouched init
        assert out["cum_ticks_min"][1] == 1e9

    def test_zero_side_trades_ignored_in_extrema(self):
        prices = np.full(4, 10.0)
        amounts = np.ones(4, np.float32)
        sides = np.array([0, 0, 1, 0], np.int8)
        out = _direc(prices, amounts, np.array([-1, 3]), sides)
        assert out["ticks_buy"][0] == 1
        assert out["cum_ticks_min"][0] == 1 and out["cum_ticks_max"][0] == 1

    def test_dollar_split(self):
        prices = np.array([10.0, 20.0])
        amounts = np.array([2.0, 3.0], np.float32)
        sides = np.array([1, -1], np.int8)
        out = _direc(prices, amounts, np.array([-1, 1]), sides)
        np.testing.assert_allclose(out["dollars_buy"], [20.0])
        np.testing.assert_allclose(out["dollars_sell"], [60.0])

    def test_random_vs_oracle(self):
        r = np.random.default_rng(23)
        n = 3000
        prices = 100 * np.exp(np.cumsum(r.normal(0, 1e-4, n)))
        amounts = (r.lognormal(-2, 1, n)).astype(np.float32)
        sides = r.choice(np.array([-1, 0, 1], np.int8), n, p=[0.45, 0.1, 0.45])
        closes = np.sort(r.choice(np.arange(5, n - 1), 40, replace=False))
        ci = np.concatenate([[-1], closes, [n - 1]]).astype(np.int64)
        out = _direc(prices, amounts.astype(np.float64), ci, sides)
        exp = _direc_oracle(prices, amounts.astype(np.float64), ci, sides)
        np.testing.assert_array_equal(out["ticks_buy"], exp["tb"])
        np.testing.assert_array_equal(out["ticks_sell"], exp["ts"])
        np.testing.assert_allclose(out["volume_buy"], exp["vb"], rtol=1e-5)
        np.testing.assert_allclose(out["dollars_sell"], exp["ds"], rtol=1e-5)
        np.testing.assert_allclose(out["mean_spread"], exp["mean_sp"],
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(out["max_spread"], exp["max_sp"],
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(out["cum_ticks_min"], exp["ctmin"])
        np.testing.assert_allclose(out["cum_ticks_max"], exp["ctmax"])
        np.testing.assert_allclose(out["cum_volume_min"], exp["cvmin"],
                                   rtol=1e-4)
        np.testing.assert_allclose(out["cum_dollars_max"], exp["cdmax"],
                                   rtol=1e-4)


class TestTradeSizeScenarios:
    def test_mean_and_p95_formulas(self):
        amounts = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
        theta = np.array([1.0])
        out = _tsize(amounts, theta, np.array([-1, 4]), mult=2.0)
        thr = 2.0
        np.testing.assert_allclose(out["mean_size_rel"],
                                   [np.log1p(3.0 / thr)], rtol=1e-6)
        p95 = np.percentile(amounts.astype(np.float64), 95)
        np.testing.assert_allclose(out["size_95_rel"],
                                   [np.log1p(p95 / thr)], rtol=1e-5)

    def test_block_volume_pct(self):
        amounts = np.array([1.0, 1.0, 10.0], np.float32)
        theta = np.array([1.0])
        out = _tsize(amounts, theta, np.array([-1, 2]), mult=5.0)
        # threshold 5: only the 10.0 trade is a block
        np.testing.assert_allclose(out["pct_block"], [10.0 / 12.0], rtol=1e-6)

    def test_gini_uniform_sizes(self):
        amounts = np.full(4, 2.0, np.float32)
        out = _tsize(amounts, np.array([1.0]), np.array([-1, 3]))
        np.testing.assert_allclose(out["size_gini"], [1.0 - 4 * 0.25 ** 2],
                                   rtol=1e-6)

    def test_gini_single_trade_zero(self):
        out = _tsize(np.array([3.0], np.float32), np.array([1.0]),
                     np.array([-1, 0]))
        np.testing.assert_allclose(out["size_gini"], [0.0])

    def test_gini_concentration_bounds(self):
        amounts = np.array([1e-4, 1e-4, 100.0], np.float32)
        out = _tsize(amounts, np.array([1.0]), np.array([-1, 2]))
        assert 0.0 <= out["size_gini"][0] < 0.01  # near-total concentration

    def test_zero_theta_gives_nan(self):
        out = _tsize(np.ones(3, np.float32), np.array([0.0]),
                     np.array([-1, 2]))
        assert np.isnan(out["mean_size_rel"][0])
        assert np.isnan(out["size_95_rel"][0])
        assert np.isnan(out["pct_block"][0])

    def test_empty_bar_nan(self):
        out = _tsize(np.ones(2, np.float32), np.array([1.0, 1.0, 1.0]),
                     np.array([-1, 0, 0, 1]))
        assert np.isnan(out["mean_size_rel"][1])
        assert np.isnan(out["size_gini"][1])

    def test_per_bar_theta(self):
        amounts = np.array([1.0, 1.0, 4.0, 4.0], np.float32)
        theta = np.array([1.0, 4.0])
        out = _tsize(amounts, theta, np.array([-1, 1, 3]), mult=1.0)
        np.testing.assert_allclose(out["mean_size_rel"],
                                   [np.log1p(1.0), np.log1p(1.0)], rtol=1e-6)

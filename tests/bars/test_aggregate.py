"""Bar aggregation tests: hand-computed expectations (the reference test
suite's dominant pattern, cf. tests/bars/test_comp_ohlcv.py) plus
independent pandas cross-checks on random data."""
import jax.numpy as jnp
import numpy as np
import pandas as pd

from finmlkit_tpu.bar.aggregate import (
    comp_bar_ohlcv,
    comp_bar_directional_features,
    comp_bar_trade_size_features,
)


class TestOhlcvHandComputed:
    def test_two_bars_six_trades(self):
        # bar 1 = trades 1..3, bar 2 = trades 4..5 (ci = [0, 3, 5])
        prices = jnp.array([100.0, 101.0, 99.0, 100.5, 102.0, 101.5])
        amounts = jnp.array([1.0, 2.0, 1.0, 3.0, 1.0, 2.0], dtype=jnp.float32)
        ci = jnp.array([0, 3, 5], dtype=jnp.int64)
        out = comp_bar_ohlcv(prices, amounts, ci)
        np.testing.assert_allclose(out["open"], [101.0, 102.0])
        np.testing.assert_allclose(out["high"], [101.0, 102.0])
        np.testing.assert_allclose(out["low"], [99.0, 101.5])
        np.testing.assert_allclose(out["close"], [100.5, 101.5])
        np.testing.assert_allclose(out["volume"], [6.0, 3.0])
        np.testing.assert_array_equal(out["trades"], [3, 2])
        # vwap bar1 = (101*2 + 99*1 + 100.5*3)/6
        np.testing.assert_allclose(
            out["vwap"], [(101 * 2 + 99 + 100.5 * 3) / 6, (102 + 101.5 * 2) / 3])
        np.testing.assert_allclose(out["median_trade_size"], [2.0, 1.5])

    def test_empty_bar_fill(self):
        prices = jnp.array([100.0, 101.0, 99.0])
        amounts = jnp.array([1.0, 1.0, 1.0], dtype=jnp.float32)
        ci = jnp.array([0, 2, 2], dtype=jnp.int64)  # bar 2 empty
        out = comp_bar_ohlcv(prices, amounts, ci)
        np.testing.assert_allclose(out["open"][1], 99.0)
        np.testing.assert_allclose(out["high"][1], 99.0)
        np.testing.assert_allclose(out["low"][1], 99.0)
        np.testing.assert_allclose(out["close"][1], 99.0)
        assert out["volume"][1] == 0.0
        assert out["vwap"][1] == 0.0
        assert out["trades"][1] == 0
        assert out["median_trade_size"][1] == 0.0

    def test_negative_anchor(self):
        # ci[0] = -1: bar 0 includes trade 0 (unaligned first time bar)
        prices = jnp.array([100.0, 101.0, 99.0])
        amounts = jnp.array([1.0, 2.0, 4.0], dtype=jnp.float32)
        ci = jnp.array([-1, 2], dtype=jnp.int64)
        out = comp_bar_ohlcv(prices, amounts, ci)
        np.testing.assert_allclose(out["open"], [100.0])
        np.testing.assert_allclose(out["volume"], [7.0])
        np.testing.assert_array_equal(out["trades"], [3])
        np.testing.assert_allclose(out["median_trade_size"], [2.0])


class TestOhlcvVsPandas:
    def test_random_data(self, trades_small):
        ts, px, amt, _ = trades_small
        interval = 60
        # independent pandas implementation with the same bar semantics:
        # (ci[i], ci[i+1]] where close index = last trade <= clock tick
        step = np.int64(interval * 1e9)
        start = (ts[0] // step) * step
        last = ((ts[-1] + step - 1) // step) * step
        clock = np.arange(start, last + 2 * step, step)
        ci = np.searchsorted(ts, clock, side="right") - 1
        out = comp_bar_ohlcv(jnp.asarray(px), jnp.asarray(amt),
                             jnp.asarray(ci))
        df = pd.DataFrame({"price": px, "amount": amt},
                          index=pd.to_datetime(ts, unit="ns"))
        # pandas label convention: bar (t, t+60] -> right-closed, right-label
        g = df.resample("60s", closed="right", label="right")
        agg = g.agg(open=("price", "first"), high=("price", "max"),
                    low=("price", "min"), close=("price", "last"),
                    vol=("amount", "sum"), cnt=("price", "count"),
                    med=("amount", "median"))
        # align: our bar i closes at clock[i+1]
        ours = pd.DataFrame(
            {k: np.asarray(v) for k, v in out.items()},
            index=pd.to_datetime(clock[1:], unit="ns"))
        joined = ours.join(agg, how="left", rsuffix="_pd")
        nonempty = joined["cnt"].fillna(0) > 0
        j = joined[nonempty]
        np.testing.assert_allclose(j["open"], j["open_pd"], rtol=1e-12)
        np.testing.assert_allclose(j["high"].values, j["high_pd"].values,
                                   rtol=1e-12)
        np.testing.assert_allclose(j["low"].values, j["low_pd"].values,
                                   rtol=1e-12)
        np.testing.assert_allclose(j["close"].values, j["close_pd"].values,
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(j["volume"], dtype=np.float64),
                                   j["vol"].values.astype(np.float64), rtol=1e-5)
        np.testing.assert_array_equal(j["trades"].values, j["cnt"].values)
        np.testing.assert_allclose(j["median_trade_size"].values,
                                   j["med"].values.astype(np.float64), rtol=1e-6)


class TestDirectional:
    def test_hand_computed(self):
        prices = jnp.array([100.0, 101.0, 100.5, 101.5, 102.0])
        amounts = jnp.array([1.0, 2.0, 1.0, 3.0, 1.0], dtype=jnp.float32)
        sides = jnp.array([1, 1, -1, 1, -1], dtype=jnp.int8)
        ci = jnp.array([0, 4], dtype=jnp.int64)  # one bar = trades 1..4
        out = comp_bar_directional_features(prices, amounts, ci, sides)
        assert out["ticks_buy"][0] == 2
        assert out["ticks_sell"][0] == 2
        np.testing.assert_allclose(out["volume_buy"][0], 5.0)
        np.testing.assert_allclose(out["volume_sell"][0], 2.0)
        np.testing.assert_allclose(out["dollars_buy"][0], 101 * 2 + 101.5 * 3)
        np.testing.assert_allclose(out["dollars_sell"][0], 100.5 + 102.0)
        # sign changes: t1 (1 vs prev side[0]=1: no), t2 (-1 vs 1: yes,
        # spread .5), t3 (1 vs -1: yes, spread 1.0), t4 (-1 vs 1: yes, .5)
        np.testing.assert_allclose(out["max_spread"][0], 1.0)
        np.testing.assert_allclose(out["mean_spread"][0], (0.5 + 1.0 + 0.5) / 4)
        # cum ticks after each trade: +1, 0, +1, 0 -> max 1, min 0
        assert out["cum_ticks_max"][0] == 1
        assert out["cum_ticks_min"][0] == 0
        # cum volumes: +2, +1, +4, +3 -> max 4, min 1
        np.testing.assert_allclose(out["cum_volume_max"][0], 4.0)
        np.testing.assert_allclose(out["cum_volume_min"][0], 1.0)

    def test_empty_bar_defaults(self):
        prices = jnp.array([100.0, 101.0])
        amounts = jnp.array([1.0, 1.0], dtype=jnp.float32)
        sides = jnp.array([1, 1], dtype=jnp.int8)
        ci = jnp.array([0, 1, 1], dtype=jnp.int64)  # bar 2 empty
        out = comp_bar_directional_features(prices, amounts, ci, sides)
        # reference init values survive for empty bars
        assert out["cum_ticks_max"][1] == -10**9
        assert out["cum_ticks_min"][1] == 10**9
        np.testing.assert_allclose(out["cum_volume_max"][1], -1e9)
        assert np.isnan(np.asarray(out["mean_spread"])[1])
        assert out["max_spread"][1] == 0.0


class TestTradeSize:
    def test_hand_computed(self):
        amounts = jnp.array([1.0, 2.0, 10.0, 1.0, 1.0], dtype=jnp.float32)
        ci = jnp.array([0, 4], dtype=jnp.int64)
        theta = jnp.array([1.0])
        out = comp_bar_trade_size_features(amounts, theta, ci, 2.0)
        a = np.array([2.0, 10.0, 1.0, 1.0])
        thr = 2.0
        np.testing.assert_allclose(out["mean_size_rel"][0],
                                   np.log1p(a.mean() / thr), rtol=1e-6)
        np.testing.assert_allclose(out["size_95_rel"][0],
                                   np.log1p(np.percentile(a, 95) / thr),
                                   rtol=1e-6)
        np.testing.assert_allclose(out["pct_block"][0], 10.0 / a.sum(), rtol=1e-6)
        np.testing.assert_allclose(out["size_gini"][0],
                                   1 - np.sum((a / a.sum()) ** 2), rtol=1e-6)

    def test_nan_conditions(self):
        amounts = jnp.array([1.0, 2.0], dtype=jnp.float32)
        ci = jnp.array([0, 1, 1], dtype=jnp.int64)
        theta = jnp.array([0.0, 1.0])  # theta=0 for bar 0; bar 1 empty
        out = comp_bar_trade_size_features(amounts, theta, ci, 5.0)
        for k in out:
            assert np.isnan(np.asarray(out[k])).all(), k

    def test_single_trade_gini_zero(self):
        amounts = jnp.array([1.0, 2.0], dtype=jnp.float32)
        ci = jnp.array([0, 1], dtype=jnp.int64)
        theta = jnp.array([1.0])
        out = comp_bar_trade_size_features(amounts, theta, ci, 5.0)
        assert out["size_gini"][0] == 0.0

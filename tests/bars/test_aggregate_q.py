"""Integer-exact fast path vs f64 reference kernels: must agree to f32
output precision; price-derived outputs exactly."""
import jax.numpy as jnp
import numpy as np
import pytest

from finmlkit_tpu.bar import aggregate, aggregate_q, indexers
from finmlkit_tpu.bar.quantize import quantize_trades


@pytest.fixture
def qtrades(trades_small):
    ts, px, amt, side = trades_small
    q = quantize_trades(px, amt.astype(np.float32))
    assert q is not None and q.exact
    return ts, px, amt.astype(np.float32), side, q


def _ci_time(ts):
    _, ci = indexers.time_bar_indexer(jnp.asarray(ts), 60.0)
    return ci


class TestOhlcvQ:
    def test_matches_f64_path(self, qtrades):
        ts, px, amt, side, q = qtrades
        ci = _ci_time(ts)
        ref = aggregate.comp_bar_ohlcv(jnp.asarray(px), jnp.asarray(amt), ci)
        got = aggregate_q.comp_bar_ohlcv_q(
            jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
            jnp.asarray(amt), ci, q.tick_size, q.amount_scale)
        for k in ("open", "high", "low", "close"):
            np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                       rtol=1e-12, err_msg=k)
        np.testing.assert_array_equal(np.asarray(got["trades"]),
                                      np.asarray(ref["trades"]))
        np.testing.assert_allclose(np.asarray(got["volume"]),
                                   np.asarray(ref["volume"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got["vwap"]),
                                   np.asarray(ref["vwap"]), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(got["median_trade_size"]),
                                   np.asarray(ref["median_trade_size"]),
                                   rtol=1e-7)


class TestDirectionalQ:
    def test_matches_f64_path(self, qtrades):
        ts, px, amt, side, q = qtrades
        ci = _ci_time(ts)
        ref = aggregate.comp_bar_directional_features(
            jnp.asarray(px), jnp.asarray(amt), ci, jnp.asarray(side))
        got = aggregate_q.comp_bar_directional_features_q(
            jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units), ci,
            jnp.asarray(side), q.tick_size, q.amount_scale)
        for k in ("ticks_buy", "ticks_sell", "cum_ticks_min", "cum_ticks_max"):
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(ref[k]), err_msg=k)
        for k in ("volume_buy", "volume_sell", "dollars_buy", "dollars_sell",
                  "max_spread", "cum_volume_min", "cum_volume_max",
                  "cum_dollars_min", "cum_dollars_max"):
            np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                       rtol=2e-6, atol=1e-6, err_msg=k)
        a = np.asarray(got["mean_spread"])
        b = np.asarray(ref["mean_spread"])
        m = ~(np.isnan(a) | np.isnan(b))
        np.testing.assert_allclose(a[m], b[m], rtol=2e-6, atol=1e-6)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))


class TestTradeSizeQ:
    def test_matches_f64_path(self, qtrades):
        ts, px, amt, side, q = qtrades
        ci = _ci_time(ts)
        n_bars = int(ci.shape[0]) - 1
        theta = jnp.full((n_bars,), 0.05, jnp.float64)
        ref = aggregate.comp_bar_trade_size_features(
            jnp.asarray(amt), theta, ci, 5.0)
        got = aggregate_q.comp_bar_trade_size_features_q(
            jnp.asarray(q.amount_units), jnp.asarray(amt), theta, ci,
            5.0, q.amount_scale)
        for k in ref:
            a, b = np.asarray(got[k]), np.asarray(ref[k])
            m = ~(np.isnan(a) | np.isnan(b))
            np.testing.assert_allclose(a[m], b[m], rtol=3e-5, atol=1e-6,
                                       err_msg=k)
            np.testing.assert_array_equal(np.isnan(a), np.isnan(b), err_msg=k)


class TestIndexersQ:
    def test_volume_indexer_q(self, qtrades):
        ts, px, amt, side, q = qtrades
        tsj = jnp.asarray(ts)
        _, ci_ref = indexers.volume_bar_indexer(tsj, jnp.asarray(amt), 5.0)
        _, ci_q = indexers.volume_bar_indexer_q(
            tsj, jnp.asarray(q.amount_units), 5.0, q.amount_scale)
        np.testing.assert_array_equal(np.asarray(ci_q), np.asarray(ci_ref))

    def test_dollar_indexer_q(self, qtrades):
        ts, px, amt, side, q = qtrades
        tsj = jnp.asarray(ts)
        _, ci_ref = indexers.dollar_bar_indexer(
            tsj, jnp.asarray(px), jnp.asarray(amt), 500.0)
        _, ci_q = indexers.dollar_bar_indexer_q(
            tsj, jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
            500.0, q.tick_size, q.amount_scale)
        a, b = np.asarray(ci_q), np.asarray(ci_ref)
        # float rounding near thresholds may shift a boundary by one trade
        assert len(a) == len(b)
        assert np.mean(np.abs(a - b) <= 1) > 0.999


class TestQuantization:
    def test_exactness(self, trades_small):
        _, px, amt, _ = trades_small
        q = quantize_trades(px, amt.astype(np.float32))
        np.testing.assert_allclose(q.price_ticks * q.tick_size, px, atol=1e-9)
        np.testing.assert_allclose(q.amount_units * q.amount_scale,
                                   amt.astype(np.float64), atol=5e-9)

    def test_irregular_prices_fallback(self):
        # a fine tick grid on large prices overflows int32 ticks -> fallback
        px = np.array([300.0, 300.0 + 1e-7, 301.0])
        amt = np.ones(3, dtype=np.float32)
        assert quantize_trades(px, amt) is None

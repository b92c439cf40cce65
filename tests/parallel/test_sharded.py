"""Multi-device sharding tests on the virtual 8-device CPU mesh: the
sharded bar products must match the single-device segment-op path
exactly (boundary carry exchange included)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finmlkit_tpu.bar import aggregate, indexers
from finmlkit_tpu.parallel import time_mesh, shard_trades, sharded_bar_products


@pytest.fixture
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return time_mesh(8)


class TestShardedBarProducts:
    def test_matches_single_device(self, mesh, trades_small):
        ts, px, amt, side = trades_small
        tsj = jnp.asarray(ts)
        _, ci = indexers.time_bar_indexer(tsj, 60.0)

        # single-device reference
        ohlcv = aggregate.comp_bar_ohlcv(
            jnp.asarray(px), jnp.asarray(amt, dtype=jnp.float32), ci)
        direc = aggregate.comp_bar_directional_features(
            jnp.asarray(px), jnp.asarray(amt, dtype=jnp.float32), ci,
            jnp.asarray(side))

        sharded = shard_trades(
            {"price": px.astype(np.float64), "amount": amt.astype(np.float32),
             "side": side.astype(np.int8)}, mesh)
        out = sharded_bar_products(sharded, ci, mesh)

        for k in ("open", "high", "low", "close", "vwap"):
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ohlcv[k]),
                                       rtol=1e-12, err_msg=k)
        np.testing.assert_allclose(np.asarray(out["volume"]),
                                   np.asarray(ohlcv["volume"]), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(out["trades"]),
                                      np.asarray(ohlcv["trades"]))
        for k in ("ticks_buy", "ticks_sell", "cum_ticks_min", "cum_ticks_max"):
            np.testing.assert_array_equal(np.asarray(out[k]),
                                          np.asarray(direc[k]), err_msg=k)
        for k in ("volume_buy", "volume_sell", "dollars_buy", "dollars_sell",
                  "cum_volume_min", "cum_volume_max",
                  "cum_dollars_min", "cum_dollars_max"):
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(direc[k]),
                                       rtol=2e-5, err_msg=k)

    def test_bars_straddle_shard_boundaries(self, mesh):
        # few large bars so every bar spans multiple shards
        n = 4096
        r = np.random.default_rng(0)
        ts = (np.arange(n) * 1_000_000_000 + 1_700_000_000_000_000_000).astype(np.int64)
        px = 100 + np.round(r.normal(0, 0.5, n).cumsum(), 2)
        amt = r.lognormal(0, 1, n).astype(np.float32)
        side = np.where(r.random(n) < 0.5, 1, -1).astype(np.int8)
        ci = jnp.asarray(np.array([-1, 1000, 2500, n - 1]), jnp.int64)

        ohlcv = aggregate.comp_bar_ohlcv(jnp.asarray(px), jnp.asarray(amt), ci)
        direc = aggregate.comp_bar_directional_features(
            jnp.asarray(px), jnp.asarray(amt), ci, jnp.asarray(side))
        sharded = shard_trades({"price": px, "amount": amt, "side": side}, mesh)
        out = sharded_bar_products(sharded, ci, mesh)
        np.testing.assert_allclose(np.asarray(out["high"]),
                                   np.asarray(ohlcv["high"]), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(out["cum_volume_max"]),
                                   np.asarray(direc["cum_volume_max"]), rtol=2e-5)
        np.testing.assert_array_equal(np.asarray(out["cum_ticks_min"]),
                                      np.asarray(direc["cum_ticks_min"]))


class TestMultiSymbol:
    def test_symbol_batch_over_time_mesh(self, mesh):
        """Multi-symbol processing: each symbol's trade stream runs through
        the same time-sharded pipeline (BASELINE config 5). Symbols are a
        batch dimension over the mesh; products must match per-symbol
        single-device results."""
        import pandas as pd
        from finmlkit_tpu.bar import aggregate
        r = np.random.default_rng(5)
        outs = {}
        for sym, seed in (("AAA", 1), ("BBB", 2)):
            n = 4096
            ts = (np.arange(n) * 500_000_000 + 1_700_000_000_000_000_000).astype(np.int64)
            px = np.round(100 + r.normal(0, 0.3, n).cumsum() * 0.01, 2)
            amt = r.lognormal(0, 1, n).astype(np.float32)
            side = np.where(r.random(n) < 0.5, 1, -1).astype(np.int8)
            _, ci = indexers.time_bar_indexer(jnp.asarray(ts), 60.0)
            sharded = shard_trades({"price": px.astype(np.float64),
                                    "amount": amt, "side": side}, mesh)
            out = sharded_bar_products(sharded, ci, mesh)
            ref = aggregate.comp_bar_ohlcv(jnp.asarray(px), jnp.asarray(amt), ci)
            np.testing.assert_allclose(np.asarray(out["close"]),
                                       np.asarray(ref["close"]), rtol=1e-12)
            outs[sym] = out
        assert set(outs) == {"AAA", "BBB"}


class TestShardedOrderStatistics:
    """Distributed radix-select order statistics must match the
    single-device one-sort path exactly (same f32 order statistics,
    same host-side f64 assembly)."""

    def test_median_matches_single_device(self, mesh, trades_small):
        from finmlkit_tpu.parallel import sharded_median_trade_size
        ts, px, amt, side = trades_small
        _, ci = indexers.time_bar_indexer(jnp.asarray(ts), 60.0)
        ref = aggregate.comp_bar_ohlcv(
            jnp.asarray(px), jnp.asarray(amt, jnp.float32), ci)
        sharded = shard_trades(
            {"price": px.astype(np.float64), "amount": amt.astype(np.float32),
             "side": side.astype(np.int8)}, mesh)
        med = sharded_median_trade_size(sharded, np.asarray(ci), mesh)
        np.testing.assert_array_equal(med, np.asarray(ref["median_trade_size"]))

    def test_kth_across_shard_boundaries(self, mesh):
        from finmlkit_tpu.parallel import sharded_segment_kth
        # 3 bars all straddling multiple shards; exact k-th checks vs numpy
        n = 4096
        r = np.random.default_rng(7)
        amt = r.lognormal(0, 1, n).astype(np.float32)
        ci = np.array([-1, 1500, 2500, n - 1], np.int64)
        sharded = shard_trades({"amount": amt}, mesh)
        ks = np.array([[0, 5, 100], [10, 999, 1594]], np.int64)
        out = np.asarray(sharded_segment_kth(sharded["amount"], ci, ks, mesh))
        for q in range(ks.shape[0]):
            for b in range(3):
                seg = np.sort(amt[ci[b] + 1: ci[b + 1] + 1])
                assert out[q, b] == seg[ks[q, b]], (q, b)

    def test_trade_size_features_match(self, mesh, trades_small):
        from finmlkit_tpu.parallel import sharded_trade_size_features
        ts, px, amt, side = trades_small
        _, ci = indexers.time_bar_indexer(jnp.asarray(ts), 300.0)
        n_bars = int(ci.shape[0]) - 1
        r = np.random.default_rng(3)
        theta = r.uniform(0.01, 0.2, n_bars)
        theta[0] = 0.0  # NaN rule
        ref = aggregate.comp_bar_trade_size_features(
            jnp.asarray(amt, jnp.float32), jnp.asarray(theta), ci, 5.0)
        sharded = shard_trades({"amount": amt.astype(np.float32)}, mesh)
        out = sharded_trade_size_features(sharded, np.asarray(ci), theta, mesh)
        for k in ("mean_size_rel", "size_95_rel", "pct_block", "size_gini"):
            np.testing.assert_allclose(out[k], np.asarray(ref[k]),
                                       rtol=1e-6, err_msg=k, equal_nan=True)

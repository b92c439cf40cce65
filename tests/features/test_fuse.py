"""Whole-graph FeatureKit compilation (feature/fuse.py): the fused
one-dispatch executor must match the per-feature executor column for
column, bit for bit, including host-fallback nodes and cache
short-circuits."""
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.feature import Compose, Feature, FeatureKit
from finmlkit_tpu.feature import transforms as T
from finmlkit_tpu.feature.fuse import build_fused


@pytest.fixture(scope="module")
def df():
    r = np.random.default_rng(5)
    n = 600
    ts = pd.date_range("2024-01-01", periods=n, freq="1min")
    close = 100 * np.exp(np.cumsum(r.normal(0, 1e-3, n)))
    high = close * (1 + np.abs(r.normal(0, 5e-4, n)))
    low = close * (1 - np.abs(r.normal(0, 5e-4, n)))
    vol = r.lognormal(0, 1, n)
    return pd.DataFrame({"close": close, "high": high, "low": low,
                         "volume": vol}, index=ts)


def _bench_kit():
    return FeatureKit([
        Feature(T.EWMA(20, "close")),
        Feature(T.RSIWilder(14, "close")),
        Feature(T.ATR(14)),
        Feature(T.Return(1, "close", is_log=True)),
        Feature(T.RealizedVolatility(30, input_col="close_ret1")),
        Feature(T.ZScore(50, "close")),
    ], retain=["close"])


class TestFusedMatchesPerFeature:
    def test_bench_kit_bitwise(self, df):
        kit = _bench_kit()
        fused = kit.build(df, backend="jax", order="topo", fuse=True)
        plain = kit.build(df, backend="jax", order="topo", fuse=False)
        assert list(fused.columns) == list(plain.columns)
        for c in fused.columns:
            np.testing.assert_array_equal(
                fused[c].to_numpy(), plain[c].to_numpy(), err_msg=c)

    def test_all_features_compiled(self, df):
        kit = _bench_kit()
        kit.build(df, backend="jax", order="topo", fuse=True)
        _, graph = kit._fused_cache
        assert len(graph.graph_feats) == 6
        assert len(graph.host_feats) == 0

    def test_ts_dependent_transforms(self, df):
        kit = FeatureKit([
            Feature(T.ReturnT(pd.Timedelta(minutes=3), is_log=True,
                              input_col="close")),
            Feature(T.EWMST(pd.Timedelta(minutes=30), "close")),
            Feature(T.BarRate(pd.Timedelta(minutes=10))),
        ], retain=[])
        fused = kit.build(df, backend="jax", fuse=True)
        plain = kit.build(df, backend="jax", fuse=False)
        for c in fused.columns:
            np.testing.assert_array_equal(
                fused[c].to_numpy(), plain[c].to_numpy(), err_msg=c)

    def test_host_fallback_nodes(self, df):
        # CUSUMTest post-processing is pandas groupby (host); operator
        # transforms stay host; both must read compiled outputs
        f = Feature(T.SMA(5, "close"))
        kit = FeatureKit([
            f,
            f * 2,
            Feature(T.CUSUMTest(window_size=40, warmup_period=20)),
        ], retain=[])
        fused = kit.build(df, backend="jax", fuse=True)
        plain = kit.build(df, backend="jax", fuse=False)
        assert list(fused.columns) == list(plain.columns)
        for c in fused.columns:
            np.testing.assert_array_equal(
                fused[c].to_numpy(), plain[c].to_numpy(), err_msg=c)
        _, graph = kit._fused_cache
        assert len(graph.graph_feats) == 1  # SMA only
        assert len(graph.host_feats) == 2

    def test_multi_output_transform(self, df):
        kit = FeatureKit([Feature(T.CandleShape(
            ["close", "high", "low", "close", "close"]))], retain=[])
        fused = kit.build(df, backend="jax", fuse=True)
        plain = kit.build(df, backend="jax", fuse=False)
        for c in fused.columns:
            np.testing.assert_array_equal(
                fused[c].to_numpy(), plain[c].to_numpy(), err_msg=c)

    def test_cached_input_column_short_circuits(self, df):
        # a precomputed column in the input frame must be returned as-is
        # (cache contract), not recomputed by the graph
        kit = FeatureKit([Feature(T.SMA(5, "close"))], retain=[])
        df2 = df.copy()
        sentinel = np.full(len(df2), 42.0)
        df2["close_sma5"] = sentinel
        out = kit.build(df2, backend="jax", fuse=True)
        np.testing.assert_array_equal(out["close_sma5"].to_numpy(), sentinel)

    def test_compose_and_dependent_feature(self, df):
        kit = FeatureKit([
            Feature(T.Return(1, "close", is_log=True)),
            Feature(Compose(T.Return(1, "close", is_log=True),
                            T.SMA(5, "close_ret1"))),
        ], retain=[])
        fused = kit.build(df, backend="jax", order="topo", fuse=True)
        plain = kit.build(df, backend="jax", order="topo", fuse=False)
        for c in fused.columns:
            np.testing.assert_array_equal(
                fused[c].to_numpy(), plain[c].to_numpy(), err_msg=c)

    def test_fused_graph_reused_across_builds(self, df):
        kit = _bench_kit()
        kit.build(df, backend="jax", fuse=True)
        g1 = kit._fused_cache[1]
        kit.build(df, backend="jax", fuse=True)
        assert kit._fused_cache[1] is g1

    def test_plan_api(self, df):
        kit = _bench_kit()
        graph, _ = build_fused(kit.features, df)
        assert sorted(graph._in_cols) == ["close", "high", "low"]

"""Feature/Compose/FeatureKit framework tests: operator algebra, caching
short-circuits, topo ordering, JSON serialization round-trips — mirroring
the reference suite's coverage (test_base_and_kit.py,
test_featurekit_serialization.py, test_caching_and_optimization.py,
test_computation_graph.py)."""
import json

import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.feature import Feature, Compose, FeatureKit
from finmlkit_tpu.feature import transforms as T
from finmlkit_tpu.feature.utils import build_feature_graph


@pytest.fixture
def df(rng):
    n = 300
    idx = pd.date_range("2024-01-01", periods=n, freq="1min")
    close = 100 * np.exp(np.cumsum(rng.normal(0, 0.002, n)))
    volume = rng.lognormal(0, 1, n)
    return pd.DataFrame({"close": close, "volume": volume}, index=idx)


class TestFeatureOps:
    def test_arithmetic(self, df):
        sma5 = Feature(T.SMA(5, "close"))
        sma20 = Feature(T.SMA(20, "close"))
        ratio = sma5 / sma20
        res = ratio(df)
        exp = (df["close"].rolling(5).mean() / df["close"].rolling(20).mean()).values
        np.testing.assert_allclose(np.asarray(res)[19:], exp[19:], rtol=1e-9)
        assert res.name == "div(close_sma5,close_sma20)"

    def test_constant_ops(self, df):
        f = Feature(T.SMA(5, "close"))
        res = (f * 2 + 1)(df)
        exp = df["close"].rolling(5).mean() * 2 + 1
        np.testing.assert_allclose(np.asarray(res)[4:], exp.values[4:], rtol=1e-9)

    def test_reverse_ops(self, df):
        f = Feature(T.SMA(5, "close"))
        res = (100 - f)(df)
        exp = 100 - df["close"].rolling(5).mean()
        np.testing.assert_allclose(np.asarray(res)[4:], exp.values[4:], rtol=1e-9)

    def test_abs_min_max(self, df):
        f1 = Feature(T.Return(1, "close"))
        f2 = Feature(T.SMA(5, "close"))
        res_abs = abs(f1)(df)
        assert (np.asarray(res_abs)[1:] >= 0).all()
        res_min = Feature.min(f1, f2)(df)
        assert len(res_min) == len(df)

    def test_apply_and_convenience(self, df):
        f = Feature(T.SMA(5, "close"))
        lagged = f.lag(2)
        res = lagged(df)
        assert res.name == "close_sma5_lag2"
        exp = df["close"].rolling(5).mean().shift(2)
        np.testing.assert_allclose(np.asarray(res)[6:], exp.values[6:], rtol=1e-9)

    def test_name_setter(self, df):
        f = Feature(T.SMA(5, "close"))
        f.name = "my_sma"
        assert f.name == "my_sma"


class TestCompose:
    def test_chain(self, df):
        c = Compose(T.Return(1, "close", is_log=True),
                    T.SMA(5, "close_ret1"))
        res = c(df)
        assert res.name == "close_ret1_sma5"
        r = np.log(df["close"] / df["close"].shift(1))
        exp = r.rolling(5).mean()
        np.testing.assert_allclose(np.asarray(res)[5:], exp.values[5:], rtol=1e-6)

    def test_cached_final_output_short_circuits(self, df):
        c = Compose(T.Return(1, "close"), T.SMA(5, "close_ret1"))
        df2 = df.copy()
        sentinel = np.arange(len(df2), dtype=float)
        df2[c.output_name] = sentinel
        res = c(df2)
        np.testing.assert_array_equal(np.asarray(res), sentinel)

    def test_intermediate_cache_reuse(self, df):
        c = Compose(T.Return(1, "close"), T.SMA(5, "close_ret1"))
        df2 = df.copy()
        sentinel = pd.Series(np.ones(len(df2)), index=df2.index)
        df2["close_ret1"] = sentinel  # first step cached
        res = c(df2)
        np.testing.assert_allclose(np.asarray(res)[4:], 1.0)


class TestFeatureKit:
    def test_build(self, df):
        kit = FeatureKit([
            Feature(T.SMA(5, "close")),
            Feature(T.EWMA(10, "close")),
            Feature(T.TimeCues("close")),
        ], retain=["close"])
        out = kit.build(df, backend="jax")
        assert "close" in out.columns
        assert "close_sma5" in out.columns
        assert "sin_td" in out.columns
        assert len(out.columns) == 3 + 9  # close, sma, ewma + 9 time cues

    def test_topo_order_resolves_dependencies(self, df):
        base = Feature(T.Return(1, "close", is_log=True))
        dependent = Feature(T.SMA(5, "close_ret1"))
        kit = FeatureKit([dependent, base], retain=[])  # wrong order on purpose
        order = kit.topological_order()
        assert order.index("close_ret1") < order.index("close_ret1_sma5")
        out = kit.build(df, backend="jax", order="topo")
        assert "close_ret1_sma5" in out.columns
        assert np.isfinite(out["close_ret1_sma5"].values[10:]).all()

    def test_cache_skips_recompute(self, df, monkeypatch):
        sma = T.SMA(5, "close")
        calls = {"n": 0}
        orig = sma._jax

        def counting(x):
            calls["n"] += 1
            return orig(x)
        monkeypatch.setattr(sma, "_jax", counting)
        f = Feature(sma)
        product = f * 2
        kit = FeatureKit([f, product], retain=[])
        # fuse=False: this asserts the PER-FEATURE executor's column-cache
        # short-circuit (the fused path traces _jax during planning, so
        # call counts measure tracing, not recomputation)
        kit.build(df, backend="jax", fuse=False)
        assert calls["n"] == 1  # second feature reuses the cached column

    def test_graph(self, df):
        f1 = Feature(T.SMA(5, "close"))
        f2 = Feature(T.EWMA(10, "close"))
        g = build_feature_graph([f1, f2])
        assert "input:close" in g.nodes
        order = g.topological_sort()
        assert order.index("input:close") < order.index("close_sma5")


class TestSerialization:
    def test_feature_roundtrip(self, df, tmp_path):
        f = Feature(T.SMA(5, "close")) / Feature(T.EWMA(10, "close"))
        cfg = f.to_config()
        f2 = Feature.from_config(json.loads(json.dumps(cfg)))
        r1 = f(df)
        r2 = f2(df)
        np.testing.assert_allclose(np.asarray(r1)[10:], np.asarray(r2)[10:],
                                   rtol=1e-12)

    def test_kit_roundtrip(self, df, tmp_path):
        kit = FeatureKit([
            Feature(T.SMA(5, "close")),
            Feature(T.RSIWilder(14, "close")),
            Feature(T.SMA(5, "close")).lag(2),
        ], retain=["close"])
        path = str(tmp_path / "kit.json")
        kit.save_config(path)
        kit2 = FeatureKit.from_config(path)
        out1 = kit.build(df, backend="jax")
        out2 = kit2.build(df, backend="jax")
        assert list(out1.columns) == list(out2.columns)
        for c in out1.columns:
            np.testing.assert_allclose(out1[c].values[20:], out2[c].values[20:],
                                       rtol=1e-9, equal_nan=True)

    def test_compose_roundtrip(self, df):
        c = Compose(T.Return(1, "close"), T.SMA(5, "close_ret1"))
        f = Feature(c)
        f2 = Feature.from_config(f.to_config())
        np.testing.assert_allclose(np.asarray(f(df))[10:], np.asarray(f2(df))[10:],
                                   rtol=1e-9, equal_nan=True)

    def test_timedelta_roundtrip(self, df):
        f = Feature(T.EWMST(pd.Timedelta(minutes=30), "close"))
        f2 = Feature.from_config(json.loads(json.dumps(f.to_config())))
        assert f2.transform.half_life_sec == 1800.0

    def test_external_roundtrip(self, df):
        f = Feature(T.ExternalFunction("numpy.log", input_cols="close",
                                       output_cols="log_close", pass_numpy=True))
        f2 = Feature.from_config(f.to_config())
        np.testing.assert_allclose(np.asarray(f(df)), np.asarray(f2(df)))


class TestProfilerHook:
    def test_profile_dir_captures_trace(self, tmp_path):
        """build(profile_dir=...) wraps the run in a jax.profiler trace
        with one TraceAnnotation per feature (SURVEY §5 aux tooling)."""
        import numpy as np
        import pandas as pd
        from finmlkit_tpu.feature.kit import Feature, FeatureKit
        from finmlkit_tpu.feature.transforms import SMA

        idx = pd.date_range("2024-01-01", periods=256, freq="1min")
        df = pd.DataFrame({"close": np.linspace(100, 110, 256)}, index=idx)
        kit = FeatureKit([Feature(SMA(8, "close"))], retain=["close"])
        out = kit.build(df, backend="pd", profile_dir=str(tmp_path))
        assert f"close_sma{8}" in out.columns or "close_sma8" in out.columns
        produced = list(tmp_path.rglob("*"))
        assert any(p.is_file() for p in produced), "no trace files written"

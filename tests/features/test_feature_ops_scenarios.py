"""Deep scenario matrix for the Feature operator algebra.

Mirrors the reference's tests/features/test_min_max_ops.py,
test_feature_apply.py and test_caching_and_optimization.py coverage
(semantics, not code): the full min/max argument matrix, every
convenience op vs a pandas oracle, apply with args/kwargs/suffix,
chained expression trees, cached-operand short circuits, and
serialization of complex operator trees.
"""
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.feature import Feature, FeatureKit
from finmlkit_tpu.feature import transforms as T


@pytest.fixture
def df():
    r = np.random.default_rng(0)
    n = 200
    idx = pd.date_range("2024-01-01", periods=n, freq="1min")
    return pd.DataFrame({
        "close": 100 + np.cumsum(r.normal(0, 0.5, n)),
        "volume": r.random(n) + 0.1,
    }, index=idx)


def _f(col="close"):
    return Feature(T.Identity(col))


class TestMinMaxMatrix:
    def test_min_feature_feature(self, df):
        out = Feature.min(_f("close"), _f("volume"))(df)
        np.testing.assert_allclose(
            out.values, np.minimum(df["close"], df["volume"]))

    def test_max_feature_feature(self, df):
        out = Feature.max(_f("close"), _f("volume"))(df)
        np.testing.assert_allclose(
            out.values, np.maximum(df["close"], df["volume"]))

    def test_min_feature_constant(self, df):
        out = Feature.min(_f(), 100.0)(df)
        np.testing.assert_allclose(out.values, np.minimum(df["close"], 100.0))

    def test_max_feature_constant(self, df):
        out = Feature.max(_f(), 100.0)(df)
        np.testing.assert_allclose(out.values, np.maximum(df["close"], 100.0))

    def test_min_constant_feature(self, df):
        out = Feature.min(99.5, _f())(df)
        np.testing.assert_allclose(out.values, np.minimum(df["close"], 99.5))

    def test_max_constant_feature(self, df):
        out = Feature.max(101.0, _f())(df)
        np.testing.assert_allclose(out.values, np.maximum(df["close"], 101.0))

    def test_complex_expression(self, df):
        # max(min(close, volume*1000), close - 1)
        expr = Feature.max(Feature.min(_f("close"), _f("volume") * 1000.0),
                           _f("close") - 1.0)
        exp = np.maximum(np.minimum(df["close"], df["volume"] * 1000.0),
                         df["close"] - 1.0)
        np.testing.assert_allclose(expr(df).values, exp)

    def test_chained_min_max(self, df):
        expr = Feature.min(Feature.max(_f(), 99.0), 101.0)
        exp = np.minimum(np.maximum(df["close"], 99.0), 101.0)
        np.testing.assert_allclose(expr(df).values, exp)


class TestConvenienceOps:
    @pytest.mark.parametrize("op,oracle", [
        ("log", lambda s: np.log(s)),
        ("log1p", lambda s: np.log1p(s)),
        ("exp", lambda s: np.exp((s - 100.0) / 100.0)),
        ("square", lambda s: s ** 2),
        ("sqrt", lambda s: np.sqrt(s)),
    ])
    def test_elementwise(self, df, op, oracle):
        f = _f()
        if op == "exp":  # keep exp in range
            f = (f - 100.0) / 100.0
        out = getattr(f, op)()(df)
        np.testing.assert_allclose(out.values, oracle(df["close"]),
                                   rtol=1e-12)

    def test_clip_both_sides(self, df):
        out = _f().clip(lower=99.0, upper=101.0)(df)
        np.testing.assert_allclose(out.values,
                                   df["close"].clip(99.0, 101.0))

    def test_clip_one_sided(self, df):
        lo = _f().clip(lower=100.0)(df)
        np.testing.assert_allclose(lo.values, df["close"].clip(lower=100.0))

    def test_rolling_mean_vs_pandas(self, df):
        out = _f().rolling_mean(10)(df)
        exp = df["close"].rolling(10).mean()
        np.testing.assert_allclose(out.values[9:], exp.values[9:], rtol=1e-9)

    def test_rolling_std_vs_pandas(self, df):
        out = _f().rolling_std(10)(df)
        exp = df["close"].rolling(10).std()
        np.testing.assert_allclose(out.values[9:], exp.values[9:], rtol=1e-6)

    def test_rolling_sum_vs_pandas(self, df):
        out = _f().rolling_sum(7)(df)
        exp = df["close"].rolling(7).sum()
        np.testing.assert_allclose(out.values[6:], exp.values[6:], rtol=1e-12)

    def test_ema_vs_pandas(self, df):
        out = _f().ema(12)(df)
        exp = df["close"].ewm(span=12, adjust=True).mean()
        np.testing.assert_allclose(out.values, exp.values, rtol=1e-9)

    def test_lag(self, df):
        out = _f().lag(3)(df)
        exp = df["close"].shift(3)
        np.testing.assert_allclose(out.values[3:], exp.values[3:])

    def test_abs_of_difference(self, df):
        out = (_f("close") - _f("volume")).abs()(df)
        np.testing.assert_allclose(out.values,
                                   np.abs(df["close"] - df["volume"]))


class TestApplyVariants:
    def test_apply_basic(self, df):
        out = _f().apply(np.log)(df)
        np.testing.assert_allclose(out.values, np.log(df["close"]))

    def test_apply_with_args(self, df):
        out = _f().apply(np.round, 1)(df)
        np.testing.assert_allclose(out.values, np.round(df["close"], 1))

    def test_apply_with_kwargs(self, df):
        out = _f().apply(np.clip, a_min=99.0, a_max=None)(df)
        np.testing.assert_allclose(out.values, np.clip(df["close"], 99.0, None))

    def test_apply_custom_suffix_names_output(self, df):
        f = _f().apply(np.log, suffix="natural_log")
        assert "natural_log" in f.name
        out = f(df)
        np.testing.assert_allclose(out.values, np.log(df["close"]))

    def test_chained_operations_tree(self, df):
        # ((close + volume) * 2 - 100) / close
        expr = ((_f("close") + _f("volume")) * 2.0 - 100.0) / _f("close")
        exp = ((df["close"] + df["volume"]) * 2.0 - 100.0) / df["close"]
        np.testing.assert_allclose(expr(df).values, exp, rtol=1e-12)

    def test_reverse_scalar_tree(self, df):
        expr = 1.0 / (100.0 - _f("volume"))
        exp = 1.0 / (100.0 - df["volume"])
        np.testing.assert_allclose(expr(df).values, exp, rtol=1e-12)


class TestCachingShortCircuits:
    def test_binary_op_reuses_cached_operands(self, df, monkeypatch):
        ewma = T.EWMA(10, "close")
        sma = T.SMA(10, "close")
        f = Feature(ewma) + Feature(sma)
        # precompute children into the cache frame
        cache = df.copy()
        cache[Feature(ewma).name] = Feature(ewma)(df)
        cache[Feature(sma).name] = Feature(sma)(df)
        calls = {"n": 0}
        orig = T.EWMA.__call__

        def spy(self, *a, **k):
            calls["n"] += 1
            return orig(self, *a, **k)

        monkeypatch.setattr(T.EWMA, "__call__", spy)
        out = f(cache, cache=cache)
        assert calls["n"] == 0  # cached child short-circuits recompute
        np.testing.assert_allclose(
            out.values,
            (cache[Feature(ewma).name] + cache[Feature(sma).name]).values)

    def test_final_output_cache_short_circuits_everything(self, df,
                                                          monkeypatch):
        f = Feature(T.EWMA(5, "close")) * 2.0
        cache = df.copy()
        sentinel = np.full(len(df), 42.0)
        cache[f.name] = sentinel
        calls = {"n": 0}
        orig = T.EWMA.__call__

        def spy(self, *a, **k):
            calls["n"] += 1
            return orig(self, *a, **k)

        monkeypatch.setattr(T.EWMA, "__call__", spy)
        out = f(cache, cache=cache)
        assert calls["n"] == 0
        np.testing.assert_allclose(out.values, sentinel)

    def test_kit_build_uses_working_frame_as_cache(self, df):
        # a feature depending on another feature's output resolves from
        # the working frame in topo order
        base = Feature(T.EWMA(10, "close"))
        dependent = Feature(T.SMA(5, base.name))
        kit = FeatureKit([base, dependent], retain=["close"])
        out = kit.build(df, backend="pd", order="topo")
        exp = df["close"].ewm(span=10, adjust=True).mean().rolling(5).mean()
        np.testing.assert_allclose(out[dependent.name].values[4:],
                                   exp.values[4:], rtol=1e-9)


class TestOperatorTreeSerialization:
    def test_complex_tree_roundtrip(self, df):
        expr = Feature.max(
            (Feature(T.EWMA(10, "close")) - Feature(T.SMA(10, "close"))).abs(),
            0.001)
        cfg = expr.to_config()
        rebuilt = Feature.from_config(cfg)
        np.testing.assert_allclose(rebuilt(df).values, expr(df).values,
                                   rtol=1e-12)
        assert rebuilt.name == expr.name

    def test_convenience_chain_roundtrip(self, df):
        expr = _f().clip(lower=99.0).log().rolling_mean(5)
        cfg = expr.to_config()
        rebuilt = Feature.from_config(cfg)
        np.testing.assert_allclose(rebuilt(df).values[5:],
                                   expr(df).values[5:], rtol=1e-12)

    def test_kit_with_operator_trees_roundtrip(self, df, tmp_path):
        k1 = FeatureKit([
            Feature.min(_f("close"), 100.0),
            (_f("close") / _f("volume")).log(),
        ], retain=["close"])
        p = str(tmp_path / "kit.json")
        k1.save_config(p)
        k2 = FeatureKit.from_config(p)
        o1 = k1.build(df, backend="pd")
        o2 = k2.build(df, backend="pd")
        pd.testing.assert_frame_equal(o1, o2)

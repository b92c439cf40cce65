"""Device-resident combined pipeline (finmlkit_tpu/pipeline.py): the
bars -> features chain with no host hop must match the two-stage host
path (bar_products_fused + FeatureKit.build) exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu import pipeline
from finmlkit_tpu.bar import fused
from finmlkit_tpu.bar.quantize import quantize_trades
from finmlkit_tpu.feature import Feature, FeatureKit
from finmlkit_tpu.feature import transforms as T
from finmlkit_tpu.feature.fuse import build_fused_from_specs


def _mk(n=6000, seed=3, n_bars=70):
    r = np.random.default_rng(seed)
    price = np.round(100 + np.cumsum(r.normal(0, 0.05, n)), 2)
    amount = np.maximum(np.round(r.lognormal(-2.5, 1.2, n), 5),
                        1e-5).astype(np.float32)
    side = r.choice(np.array([-1, 1], np.int8), n)
    side[::97] = 0
    q = quantize_trades(price, amount)
    assert q is not None
    ci = np.concatenate([
        [-1], np.sort(r.choice(np.arange(1, n - 1), n_bars, replace=False)),
        [n - 1]]).astype(np.int64)
    ci = np.unique(ci)
    ci = np.sort(np.concatenate([ci, [ci[5]]]))  # empty bar
    ts = 1_700_000_000_000_000_000 + np.arange(n, dtype=np.int64) * 50_000_000
    return price, amount, side, q, ci, ts


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    # compiling the big final-readback program after ~650 accumulated
    # test compilations intermittently SEGFAULTS XLA:CPU (standalone
    # runs are always green); dropping the jit/compiler caches first
    # restores the standalone conditions
    jax.clear_caches()
    yield


FEATS = [
    Feature(T.EWMA(20, "close")),
    Feature(T.RSIWilder(14, "close")),
    Feature(T.ATR(14)),
    Feature(T.Return(1, "close", is_log=True)),
    Feature(T.ZScore(50, "close")),
]


class TestDevicePipeline:
    @pytest.fixture(scope="class")
    def case(self):
        price, amount, side, q, ci, ts = _mk()
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        bar_ts = ts[np.clip(ci[1:], 0, len(ts) - 1)]

        # host path: products then FeatureKit over a DataFrame
        ohlcv_h, direc_h = fused.bar_products_fused(
            *args, tick_size=q.tick_size, amount_scale=q.amount_scale,
            amounts_f32=jnp.asarray(amount), ci_host=ci, packed=True,
            interpret=True)
        df = pd.DataFrame(
            {k: ohlcv_h[k] for k in
             ("open", "high", "low", "close", "volume", "vwap", "trades")},
            index=pd.DatetimeIndex(bar_ts))
        kit = FeatureKit(FEATS, retain=["close"])
        feats_h = kit.build(df, backend="jax", order="topo")

        # device-resident chain
        import jax
        n_bars = len(ci) - 1
        specs = {c: jax.ShapeDtypeStruct((n_bars,), np.float64)
                 for c in ("open", "high", "low", "close", "volume",
                           "vwap")}
        specs["trades"] = jax.ShapeDtypeStruct((n_bars,), np.int64)
        graph = build_fused_from_specs(
            FEATS, specs, jax.ShapeDtypeStruct((n_bars,), np.int64))
        ohlcv_d, direc_d, feats_d = pipeline.bar_feature_pipeline_device(
            *args, tick_size=q.tick_size, amount_scale=q.amount_scale,
            graph=graph, bar_ts=jnp.asarray(bar_ts),
            amounts_f32=jnp.asarray(amount), ci_host=ci,
            interpret=True)
        return ohlcv_h, direc_h, feats_h, ohlcv_d, direc_d, feats_d

    def test_bar_products_identical(self, case):
        ohlcv_h, direc_h, _, ohlcv_d, direc_d, _ = case
        for k in ohlcv_h:
            np.testing.assert_array_equal(np.asarray(ohlcv_h[k]),
                                          np.asarray(ohlcv_d[k]), err_msg=k)
        for k in direc_h:
            np.testing.assert_array_equal(np.asarray(direc_h[k]),
                                          np.asarray(direc_d[k]), err_msg=k)

    def test_features_match_host_path(self, case):
        _, _, feats_h, _, _, feats_d = case
        checked = 0
        for col in feats_d:
            if col not in feats_h.columns:
                continue
            a = np.asarray(feats_d[col], np.float64)
            b = feats_h[col].to_numpy(np.float64)
            m = np.isnan(b)
            assert (np.isnan(a) == m).all(), col
            np.testing.assert_allclose(a[~m], b[~m], rtol=1e-12,
                                       atol=1e-12, err_msg=col)
            checked += 1
        assert checked >= len(FEATS)

    def test_v4_kernel_variant(self):
        # scan_kernel="v4" through the device pipeline: same outputs
        price, amount, side, q, ci, ts = _mk(seed=9, n=4000, n_bars=40)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        import jax
        n_bars = len(ci) - 1
        specs = {c: jax.ShapeDtypeStruct((n_bars,), np.float64)
                 for c in ("close",)}
        graph = build_fused_from_specs(
            [Feature(T.EWMA(10, "close"))], specs)
        outs = []
        for kern in ("v2", "v4"):
            _, _, feats = pipeline.bar_feature_pipeline_device(
                *args, tick_size=q.tick_size, amount_scale=q.amount_scale,
                graph=graph, amounts_f32=jnp.asarray(amount), ci_host=ci,
                interpret=True, scan_kernel=kern)
            outs.append(feats)
        for col in outs[0]:
            np.testing.assert_array_equal(outs[0][col], outs[1][col],
                                          err_msg=col)

    def test_duplicate_output_feature_demoted(self):
        # fuse.plan: a later feature with the same output column must be
        # rejected from the device-resident graph (host tier required)
        import jax
        specs = {"close": jax.ShapeDtypeStruct((100,), np.float64)}
        feats = [Feature(T.EWMA(10, "close")), Feature(T.EWMA(10, "close"))]
        with pytest.raises(ValueError, match="host tiers"):
            build_fused_from_specs(feats, specs)

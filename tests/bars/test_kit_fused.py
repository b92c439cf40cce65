"""The fused single-pass pipeline IS the product path: TimeBarKit
dispatches to bar/fused.py (FMKT_FUSED=interpret on CPU; native on TPU)
and must match the staged aggregate paths exactly. Trade-size features
come from the fused native host kernel (seg_bar_stats)."""
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu import native
from finmlkit_tpu.bar import TimeBarKit, TradesData
from finmlkit_tpu.bar.fused import trade_size_features_native

from tests.conftest import generate_trades


@pytest.fixture()
def trades():
    ts, price, amount, side = generate_trades(n=8000, seed=13)
    ids = np.arange(len(ts), dtype=np.int64)
    td = TradesData(ts, price, amount, ids, timestamp_unit="ns",
                    preprocess=False)
    td.data["side"] = side
    return td


def _kits(trades, monkeypatch):
    monkeypatch.setenv("FMKT_FUSED", "off")
    staged = TimeBarKit(trades, pd.Timedelta(minutes=1))
    monkeypatch.setenv("FMKT_FUSED", "interpret")
    fused = TimeBarKit(trades, pd.Timedelta(minutes=1))
    return staged, fused


def test_kit_ohlcv_fused_matches_staged(trades, monkeypatch):
    staged, fused = _kits(trades, monkeypatch)
    a = staged.build_ohlcv()
    monkeypatch.setenv("FMKT_FUSED", "interpret")
    b = fused.build_ohlcv()
    assert list(a.columns) == list(b.columns)
    for col in a.columns:
        np.testing.assert_allclose(b[col].values.astype(np.float64),
                                   a[col].values.astype(np.float64),
                                   rtol=1e-6, atol=1e-9, err_msg=col)
    pd.testing.assert_index_equal(a.index, b.index)


def test_kit_directional_fused_matches_staged(trades, monkeypatch):
    staged, fused = _kits(trades, monkeypatch)
    a = staged.build_directional_features()
    monkeypatch.setenv("FMKT_FUSED", "interpret")
    b = fused.build_directional_features()
    assert list(a.columns) == list(b.columns)
    for col in a.columns:
        np.testing.assert_allclose(b[col].values.astype(np.float64),
                                   a[col].values.astype(np.float64),
                                   rtol=1e-5, atol=1e-5, err_msg=col)


def test_kit_fused_single_pass_cached(trades, monkeypatch):
    """One fused pass serves both product families (cache hit)."""
    monkeypatch.setenv("FMKT_FUSED", "interpret")
    kit = TimeBarKit(trades, pd.Timedelta(minutes=1))
    kit.build_ohlcv()
    cache = kit._fused_cache
    assert cache is not None
    kit.build_directional_features()
    assert kit._fused_cache is cache


def test_kit_trade_size_native_matches_staged(trades, monkeypatch):
    if native.lib() is None:
        pytest.skip("native toolchain unavailable")
    monkeypatch.setenv("FMKT_FUSED", "off")
    kit = TimeBarKit(trades, pd.Timedelta(minutes=1))
    kit.build_ohlcv()
    theta = 0.1
    a = kit.build_trade_size_features(theta)  # native path (host kernel)

    # staged device path, forced by bypassing the native call
    nb = kit._n_bars
    theta_pad = np.concatenate(
        [np.full(nb, theta), np.zeros(kit._ci_padded.shape[0] - 1 - nb)])
    import jax.numpy as jnp
    from finmlkit_tpu.bar import aggregate_q
    out = aggregate_q.comp_bar_trade_size_features_q(
        kit._units, kit._amt, jnp.asarray(theta_pad), kit._ci_padded,
        5.0, kit._amount_scale)
    for col in a.columns:
        np.testing.assert_allclose(a[col].values, np.asarray(out[col])[:nb],
                                   rtol=2e-5, atol=2e-6, err_msg=col)


def test_seg_bar_stats_vs_numpy():
    if native.lib() is None:
        pytest.skip("native toolchain unavailable")
    r = np.random.default_rng(0)
    n = 5000
    vals = r.lognormal(-2, 1.3, n).astype(np.float32)
    ci = np.concatenate([[-1], np.sort(r.choice(np.arange(1, n - 1), 60,
                                                replace=False)), [n - 1]])
    ci = np.unique(ci).astype(np.int64)
    ci = np.sort(np.concatenate([ci, [ci[7]]]))  # empty bar
    thr = np.full(len(ci) - 1, 0.3)
    s = native.seg_bar_stats(vals, ci, thr=thr, q=0.95)
    for i in range(len(ci) - 1):
        lo, hi = ci[i] + 1, ci[i + 1]
        seg = vals[lo:hi + 1]
        if len(seg) == 0:
            assert s["sum"][i] == 0.0
            continue
        med = (float(s["med_a"][i]) + float(s["med_b"][i])) / 2
        assert med == pytest.approx(float(np.median(seg)), rel=1e-6)
        pos = 0.95 * (len(seg) - 1)
        frac = pos - s["q_lo"][i]
        p95 = s["q_a"][i] * (1 - frac) + s["q_b"][i] * frac
        assert p95 == pytest.approx(float(np.percentile(seg, 95)), rel=1e-5)
        assert s["sum"][i] == pytest.approx(seg.astype(np.float64).sum(), rel=1e-12)
        assert s["sumsq"][i] == pytest.approx(
            (seg.astype(np.float64) ** 2).sum(), rel=1e-12)
        assert s["block_sum"][i] == pytest.approx(
            seg.astype(np.float64)[seg > 0.3].sum(), rel=1e-12)


def test_trade_size_features_native_vs_reference_numpy():
    if native.lib() is None:
        pytest.skip("native toolchain unavailable")
    r = np.random.default_rng(2)
    n = 3000
    vals = r.lognormal(-2, 1.0, n).astype(np.float32)
    ci = np.unique(np.concatenate(
        [[-1], np.sort(r.choice(np.arange(1, n - 1), 40, replace=False)),
         [n - 1]])).astype(np.int64)
    n_bars = len(ci) - 1
    theta = np.full(n_bars, 0.15)
    theta[3] = 0.0  # reference: theta==0 -> NaN row
    out = trade_size_features_native(vals, ci, theta, 5.0)
    assert out is not None
    for i in range(n_bars):
        lo, hi = ci[i] + 1, ci[i + 1]
        seg = vals[lo:hi + 1].astype(np.float64)
        if len(seg) == 0 or theta[i] == 0.0:
            assert np.isnan(out["mean_size_rel"][i])
            continue
        thr = theta[i] * 5.0
        assert out["mean_size_rel"][i] == pytest.approx(
            np.log1p(seg.mean() / thr), rel=1e-5)
        assert out["size_95_rel"][i] == pytest.approx(
            np.log1p(np.percentile(seg, 95) / thr), rel=1e-4)
        v = seg.sum()
        assert out["pct_block"][i] == pytest.approx(
            seg[seg > thr].sum() / v, abs=1e-6)
        gini = 0.0 if len(seg) == 1 else 1.0 - ((seg / v) ** 2).sum()
        assert out["size_gini"][i] == pytest.approx(gini, abs=1e-6)

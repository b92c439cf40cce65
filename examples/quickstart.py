"""Quickstart: trades -> bars -> features -> labels -> weights.

Mirrors the workflow of the reference's QuickStartGuide notebook on
synthetic data. Run on CPU or TPU:

    python examples/quickstart.py
"""
import os
import sys

import numpy as np
import pandas as pd

# runnable without installation: repo root onto sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finmlkit_tpu.bar import TradesData, TimeBarKit, DollarBarKit
from finmlkit_tpu.feature import Feature, Compose, FeatureKit
from finmlkit_tpu.feature import transforms as T
from finmlkit_tpu.label import TBMLabel, SampleWeights
from finmlkit_tpu.sampling import cusum_filter


def synth(n=200_000, seed=0):
    r = np.random.default_rng(seed)
    dt = (r.exponential(120.0, n) * 1e6).astype(np.int64)
    ts = 1_700_000_000_000_000_000 + np.cumsum(dt)
    price = np.round(40_000 * np.exp(np.cumsum(r.normal(0, 5e-5, n))), 1)
    amount = np.maximum(np.round(r.lognormal(-3, 1.4, n), 5), 1e-5).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    maker = r.random(n) < 0.5
    return ts, price, amount, ids, maker


def main():
    ts, px, qty, ids, maker = synth()

    # 1) preprocess raw trades (sort, dedup, merge splits, side inference)
    trades = TradesData(ts, px, qty, ids, is_buyer_maker=maker,
                        preprocess=True, name="DEMO")
    print(f"preprocessed {len(trades.data):,} trades "
          f"(integrity ok: {trades.data_ok}, missing {trades.missing_pct:.3f}%)")

    # 2) bars: time bars + dollar bars
    tkit = TimeBarKit(trades, pd.Timedelta(minutes=1))
    bars = tkit.build_ohlcv()
    direc = tkit.build_directional_features()
    print(f"time bars: {len(bars):,}; dollar bars: "
          f"{len(DollarBarKit(trades, 2_000_000).build_ohlcv()):,}")

    # 3) footprints + intra-bar features
    fp = tkit.build_footprints()
    print(f"footprints: {len(fp)} bars, max {fp.buy_volumes.shape[1]} levels, "
          f"{fp.memory_usage() / 1e6:.1f} MB dense")

    # 4) feature pipeline with caching + topological execution
    df = bars.join(direc[["volume_buy", "volume_sell"]])
    kit = FeatureKit([
        Feature(T.ReturnT(pd.Timedelta(minutes=1), is_log=True, input_col="close")),
        Feature(T.EWMA(20, "close")),
        Feature(T.RSIWilder(14, "close")),
        Feature(T.VPIN(16)),
        Feature(Compose(T.Return(1, "close", is_log=True),
                        T.SMA(5, "close_ret1"))),
        Feature(T.EWMST(pd.Timedelta(minutes=30), "close")),
    ], retain=["close", "volume"])
    feats = kit.build(df, backend="jax", order="topo")
    print(f"features: {list(feats.columns)}")

    # 5) CUSUM event sampling + triple-barrier labels + sample weights
    events = cusum_filter(feats["close"].values, np.array([0.001]))
    feats = feats.assign(tgt=feats["close_ewms1800.0s"])
    label_kit = TBMLabel(feats.dropna(subset=["tgt"]), target_ret_col="tgt",
                         min_ret=0.0, horizontal_barriers=(1.0, 1.0),
                         vertical_barrier=pd.Timedelta(minutes=30))
    _, out = label_kit.compute_labels(trades)
    print(f"labels: {out['labels'].value_counts().to_dict()}")

    info = label_kit.compute_weights(trades)
    final = SampleWeights.compute_final_weights(
        info["avg_uniqueness"], time_decay_intercept=0.5,
        return_attribution=info["return_attribution"],
        vertical_touch_weights=out["vertical_touch_weights"],
        labels=out["labels"])
    print(f"weights: mean={final['weights'].mean():.3f} "
          f"(n={len(final)})")


if __name__ == "__main__":
    main()

"""On-chip probe: device-resident feature graph cost per feature subset.

Bisects the ~3.6s device-time anomaly of the combined pipeline's
feature program (bench config5) by timing the fused graph over subsets
of the feature list, fed from device-resident bar columns.

Usage: python scripts/probe_pipeline.py [n_trades]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    from bench import synth_trades, _bench
    from finmlkit_tpu import pipeline as fpipe
    from finmlkit_tpu.bar import fused
    from finmlkit_tpu.bar.indexers import time_bar_indexer
    from finmlkit_tpu.bar.quantize import quantize_trades
    from finmlkit_tpu.feature import Feature
    from finmlkit_tpu.feature import transforms as T
    from finmlkit_tpu.feature.fuse import build_fused_from_specs

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 39_171_929
    ts, price, amount, side = synth_trades(n)
    q = quantize_trades(price, amount)
    tsj = jax.device_put(jnp.asarray(ts))
    tkj = jax.device_put(jnp.asarray(q.price_ticks))
    unj = jax.device_put(jnp.asarray(q.amount_units))
    sdj = jax.device_put(jnp.asarray(side))
    jax.block_until_ready((tsj, tkj, unj, sdj))
    _, ci = time_bar_indexer(tsj, 60.0, ts_first=int(ts[0]),
                             ts_last_i=int(ts[-1]))
    ci = jax.block_until_ready(ci)
    n_bars = int(ci.shape[0]) - 1
    bar_ts = np.asarray(time_bar_indexer(
        tsj, 60.0, ts_first=int(ts[0]), ts_last_i=int(ts[-1]))[0])[1:]
    print(f"# {n_bars:,} bars", file=sys.stderr)

    bufs = fused.fused_packed_v2_device(tkj, unj, ci, sdj, kernel="v4")
    cols = fpipe.bar_cols_device(bufs, ci, q.tick_size, q.amount_scale)
    cols = jax.block_until_ready(cols)
    bar_ts_dev = jax.device_put(jnp.asarray(bar_ts))

    subsets = {
        "ewma": [Feature(T.EWMA(20, "close"))],
        "rsi": [Feature(T.RSIWilder(14, "close"))],
        "atr": [Feature(T.ATR(14))],
        "ret": [Feature(T.Return(1, "close", is_log=True))],
        "ret+rvol": [Feature(T.Return(1, "close", is_log=True)),
                     Feature(T.RealizedVolatility(30,
                                                  input_col="close_ret1"))],
        "zscore": [Feature(T.ZScore(50, "close"))],
        "all6": [Feature(T.EWMA(20, "close")),
                 Feature(T.RSIWilder(14, "close")),
                 Feature(T.ATR(14)),
                 Feature(T.Return(1, "close", is_log=True)),
                 Feature(T.RealizedVolatility(30, input_col="close_ret1")),
                 Feature(T.ZScore(50, "close"))],
    }
    specs = {c: jax.ShapeDtypeStruct((n_bars,), np.float64)
             for c in ("open", "high", "low", "close", "volume", "vwap")}
    specs["trades"] = jax.ShapeDtypeStruct((n_bars,), np.int64)
    ts_spec = jax.ShapeDtypeStruct((n_bars,), np.int64)

    for name, feats in subsets.items():
        try:
            graph = build_fused_from_specs(feats, specs, ts_spec)

            def run(graph=graph):
                out = graph.run_device(cols, ts=bar_ts_dev)
                return out

            t0 = time.time()
            run()
            cold = time.time() - t0
            t, _ = _bench(run, k=3)
            print(f"# {name}: cold {cold:.1f}s warm {t * 1000:.1f}ms",
                  file=sys.stderr)
        except Exception as e:
            print(f"# {name}: FAILED {e!r}", file=sys.stderr)


if __name__ == "__main__":
    main()

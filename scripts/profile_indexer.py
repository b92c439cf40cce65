"""Stage-by-stage timing of time_bar_indexer on the TPU."""
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000


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
    from finmlkit_tpu.bar.indexers import _time_bar_ci
    from finmlkit_tpu.ops.pallas_scan import fast_cumsum

    ts, price, amount, side = synth_trades(N)
    tsj = jax.device_put(jnp.asarray(ts))
    jax.block_until_ready(tsj)

    step = 60.0 * 1e9
    ts0, ts_last = float(ts[0]), float(ts[-1])
    start = math.floor(ts0 / step) * step
    last = math.ceil(ts_last / step) * step
    stop = last + step + 1.0
    n_clock = int(np.ceil((stop - start) / step))
    print(f"n_clock={n_clock}")

    dt, cnt = t(lambda: jax.block_until_ready(
        _time_bar_ci(tsj, jnp.float64(start), n_clock, int(step), int(start),
                     1.0 / step)), k=5)
    print(f"_time_bar_ci: {dt*1000:.1f} ms")

    dt, cs = t(lambda: jax.block_until_ready(fast_cumsum(cnt)), k=5)
    print(f"fast_cumsum(cnt) [{cnt.shape[0]} el]: {dt*1000:.1f} ms")

    dt, _ = t(lambda: jax.block_until_ready(jnp.cumsum(cnt)), k=5)
    print(f"jnp.cumsum(cnt): {dt*1000:.1f} ms")

    dt, ci = t(lambda: jax.block_until_ready(cs[:n_clock] - 1), k=5)
    print(f"slice-sub: {dt*1000:.1f} ms")

    clock = (start + np.arange(n_clock, dtype=np.float64) * step).astype(np.int64)
    dt, _ = t(lambda: jax.block_until_ready(jnp.asarray(clock)), k=5)
    print(f"clock device_put: {dt*1000:.1f} ms")

    # single-jit variant: bins + cumsum + sub in one dispatch
    from functools import partial

    @partial(jax.jit, static_argnames=("n_clock", "step_i", "start_i", "inv_step"))
    def fused_ci(timestamps, start_f, n_clock, step_i, start_i, inv_step):
        n = timestamps.shape[0]

        def clock_at(k):
            prod = (k * step_i).astype(jnp.float64)
            return (start_f + prod).astype(jnp.int64)

        rel = (timestamps - start_i).astype(jnp.float32)
        b = jnp.floor(rel * jnp.float32(inv_step)).astype(jnp.int64)
        resid = (timestamps - clock_at(b)).astype(jnp.float32)
        b = b + jnp.floor(resid * jnp.float32(inv_step)).astype(jnp.int64)
        b = jnp.where(timestamps <= clock_at(b), b - 1, b)
        b = jnp.where(timestamps > clock_at(b + 1), b + 1, b)
        cnt = jnp.zeros((n_clock + 1,), jnp.int32)
        cnt = cnt.at[jnp.clip(b + 1, 0, n_clock)].add(1)
        return jnp.cumsum(cnt[:n_clock].astype(jnp.int64)) - 1

    try:
        t0 = time.time()
        ci2 = jax.block_until_ready(fused_ci(tsj, jnp.float64(start), n_clock,
                                             int(step), int(start), 1.0 / step))
        print(f"fused_ci cold: {time.time()-t0:.1f} s")
        dt, ci2 = t(lambda: jax.block_until_ready(
            fused_ci(tsj, jnp.float64(start), n_clock, int(step), int(start),
                     1.0 / step)), k=5)
        print(f"fused_ci warm: {dt*1000:.1f} ms")
        print("match:", bool(jnp.all(ci2 == ci)))
    except Exception as e:
        print("fused_ci failed:", repr(e))


if __name__ == "__main__" and not os.environ.get("E2E"):
    main()


def main2():
    import time as _t
    import jax
    import jax.numpy as jnp
    from bench import synth_trades
    from finmlkit_tpu.bar.indexers import time_bar_indexer
    ts, price, amount, side = synth_trades(N)
    tsj = jax.device_put(jnp.asarray(ts))
    jax.block_until_ready(tsj)
    def run():
        close_ts, ci = time_bar_indexer(tsj, 60.0, ts_first=int(ts[0]), ts_last_i=int(ts[-1]))
        return jax.block_until_ready(ci)
    t0=_t.time(); run(); print(f"e2e cold-ish: {_t.time()-t0:.2f}s")
    for i in range(5):
        t0=_t.time(); run(); print(f"e2e call {i}: {(_t.time()-t0)*1000:.1f}ms")


if __name__ == "__main__" and os.environ.get("E2E"):
    main2()

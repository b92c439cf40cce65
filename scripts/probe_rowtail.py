"""Probe: boundary-output (v2) vs full-plane (v1) fused pipelines at 39M
trades on the real chip — device-only and packed-e2e timings + parity."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 39_171_929


def main():
    import jax
    import jax.numpy as jnp
    from finmlkit_tpu.bar import fused
    from finmlkit_tpu.bar.quantize import quantize_trades

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    r = np.random.default_rng(0)
    ts = 1_751_328_000_000_000_000 + np.cumsum(
        (r.exponential(70.0, N) * 1e6).astype(np.int64))
    price = np.round(107_000.0 * np.exp(np.cumsum(r.normal(0, 2e-5, N))), 1)
    amount = np.maximum(np.round(r.lognormal(-4.0, 1.5, N), 5),
                        1e-5).astype(np.float32)
    side = np.where(r.random(N) < 0.5, 1, -1).astype(np.int8)
    q = quantize_trades(price, amount)
    n_bars = max(N // 857, 4)
    ci = np.concatenate([[-1], np.sort(r.choice(
        np.arange(1, N - 1), n_bars - 1, replace=False)), [N - 1]]).astype(np.int64)
    ci = np.unique(ci)

    tkj = jax.device_put(jnp.asarray(q.price_ticks))
    unj = jax.device_put(jnp.asarray(q.amount_units))
    sdj = jax.device_put(jnp.asarray(side))
    cij = jax.device_put(jnp.asarray(ci))
    jax.block_until_ready((tkj, unj, sdj, cij))
    print(f"# put done: {N:,} trades, {len(ci)-1:,} bars", file=sys.stderr)

    def force(x):
        while isinstance(x, (tuple, list)):
            x = x[0]
        return np.asarray(x[:1, :4] if x.ndim > 1 else x[:4])

    def bench(fn, k=5):
        t0 = time.time()
        force(fn())
        cold = time.time() - t0
        ts_ = []
        for _ in range(k):
            t0 = time.time()
            r0 = fn()
            force(r0)
            ts_.append(time.time() - t0)
        s = sorted(ts_)
        return cold, s[0], s[len(s) // 2], r0

    c1, m1, md1, v1 = bench(
        lambda: fused.fused_packed_device(tkj, unj, cij, sdj))
    print(f"v1 full-plane packed: cold {c1:.1f}s min {m1*1e3:.1f}ms med {md1*1e3:.1f}ms")
    c2, m2, md2, v2 = bench(
        lambda: fused.fused_packed_v2_device(tkj, unj, cij, sdj))
    print(f"v2 rowtail packed:   cold {c2:.1f}s min {m2*1e3:.1f}ms med {md2*1e3:.1f}ms")

    for b1, b2, name in zip(jax.device_get(v1), jax.device_get(v2),
                            ["i64", "i32", "f32"]):
        same = np.array_equal(np.asarray(b1), np.asarray(b2))
        print(f"parity {name}: {'OK' if same else 'MISMATCH'}")
        if not same:
            d = np.argwhere(np.asarray(b1) != np.asarray(b2))
            print("first diffs:", d[:5], np.asarray(b1)[tuple(d[0])],
                  np.asarray(b2)[tuple(d[0])])


if __name__ == "__main__":
    main()

"""Probe: one-sort device median engine at 39M trades on the real chip.

Compares the composite-int64 single sort (median_sort_device) against a
two-operand int32 lax.sort variant, and times the full engine vs the
bare jnp.sort. Run fresh (tunnel clients can wedge; see BENCH_NOTES.md).
"""
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

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    r = np.random.default_rng(0)
    amount = np.maximum(np.round(r.lognormal(-4.0, 1.5, N), 5),
                        1e-5).astype(np.float32)
    # ~45k bars of ~857 trades
    n_bars = max(N // 857, 4)
    ci = np.concatenate([[-1], np.sort(r.choice(
        np.arange(1, N - 1), n_bars - 1, replace=False)), [N - 1]]).astype(np.int64)
    ci = np.unique(ci)
    amt_j = jax.device_put(jnp.asarray(amount))
    ci_j = jax.device_put(jnp.asarray(ci))
    jax.block_until_ready((amt_j, ci_j))
    print(f"# put done: {N:,} trades, {len(ci)-1:,} bars", file=sys.stderr)

    def _force(x):
        # block_until_ready can return early through the tunnel; a value
        # fetch is the only trustworthy completion signal (BENCH_NOTES)
        while isinstance(x, (tuple, list)):
            x = x[0]
        return np.asarray(x[:4])

    def bench(fn, k=6):
        t0 = time.time()
        r0 = fn()
        _force(r0)
        cold = time.time() - t0
        ts = []
        for _ in range(k):
            t0 = time.time()
            r0 = fn()
            _force(r0)
            ts.append(time.time() - t0)
        return cold, min(ts), float(np.median(ts)), r0

    # bare sort baseline
    key = ((jnp.arange(N, dtype=jnp.int64) // 857) << 32) | 7
    key = jax.device_put(key)
    jax.block_until_ready(key)
    cold, tmin, tmed, _ = bench(lambda: jnp.sort(key), k=4)
    print(f"bare jnp.sort i64: cold {cold:.1f}s warm min {tmin*1e3:.1f}ms med {tmed*1e3:.1f}ms")

    cold, tmin, tmed, med = bench(
        lambda: fused.median_sort_device(amt_j, ci_j))
    print(f"median_sort_device: cold {cold:.1f}s warm min {tmin*1e3:.1f}ms med {tmed*1e3:.1f}ms")

    # verify vs numpy on a few bars
    med_a = np.asarray(med[0])
    med_b = np.asarray(med[1])
    for i in list(range(5)) + [len(ci) - 2]:
        seg = amount[ci[i] + 1: ci[i + 1] + 1]
        if len(seg):
            want = np.median(seg.astype(np.float64))
            got = (float(med_a[i]) + float(med_b[i])) / 2
            assert got == want, (i, got, want)
    print("parity ok")

    # two-operand variant: lax.sort((bid_i32, bits_i32), num_keys=2)
    import functools

    @functools.partial(jax.jit)
    def two_op(amounts, ci):
        from finmlkit_tpu.ops.pallas_scan import _cumsum_2d
        from finmlkit_tpu.ops.segment import _f32_sortable_bits
        n = amounts.shape[0]
        n_bars_ = ci.shape[0] - 1
        marks = jnp.zeros((n + 1,), jnp.int32).at[
            jnp.clip(ci[1:] + 1, 0, n)].add(np.int32(1))[:n]
        pad = (-n) % (64 * 128)
        mp = jnp.concatenate([marks, jnp.zeros((pad,), jnp.int32)])
        bar_cum = _cumsum_2d(mp.reshape(-1, 128)).reshape(-1)[:n]
        idx = jnp.arange(n, dtype=ci.dtype)
        valid = (idx > ci[0]) & (idx <= ci[-1])
        bid = jnp.where(valid, jnp.clip(bar_cum, 0, n_bars_ - 1),
                        jnp.int32(n_bars_))
        bits = _f32_sortable_bits(amounts).astype(jnp.int32)
        _, sbits = jax.lax.sort((bid, bits), num_keys=2)
        return sbits

    try:
        cold, tmin, tmed, _ = bench(lambda: two_op(amt_j, ci_j), k=4)
        print(f"two-op lax.sort: cold {cold:.1f}s warm min {tmin*1e3:.1f}ms med {tmed*1e3:.1f}ms")
    except Exception as e:
        print(f"two-op failed: {e!r}")


if __name__ == "__main__":
    main()

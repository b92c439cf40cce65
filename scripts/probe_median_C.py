"""On-chip probe: rowsort median engine vs row width C at monthly scale.

Sort cost ~ n*log2(C)^2 while the two-run bisection cost for
row-spanning bars grows ~n_pad/C — this sweep finds the crossover.

Usage: python scripts/probe_median_C.py [n_trades] [C...]
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
    from finmlkit_tpu.bar import fused
    from finmlkit_tpu.bar.indexers import time_bar_indexer
    from finmlkit_tpu.bar.quantize import quantize_trades

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 39_171_929
    Cs = [int(c) for c in sys.argv[2:]] or [2048, 4096, 8192, 16384, 32768]
    ts, price, amount, side = synth_trades(n)
    q = quantize_trades(price, amount)

    tsj = jax.device_put(jnp.asarray(ts))
    amj = jax.device_put(jnp.asarray(amount))
    jax.block_until_ready((tsj, amj))
    _, ci = time_bar_indexer(tsj, 60.0, ts_first=int(ts[0]),
                             ts_last_i=int(ts[-1]))
    ci = jax.block_until_ready(ci)
    ci_host = np.asarray(ci)
    max_count = int(np.max(np.diff(ci_host)))
    print(f"# {int(ci.shape[0]) - 1:,} bars, max bar {max_count:,} trades",
          file=sys.stderr)

    ref = None
    for C in Cs:
        if max_count > C:
            print(f"# C={C}: skipped (max bar {max_count} > C)",
                  file=sys.stderr)
            continue

        def run(C=C):
            a, b = fused.median_rowsort_device(amj, ci,
                                               max_count=max_count, C=C)
            np.asarray(a[:4])
            return a, b

        reps = int(os.environ.get("PROBE_REPS", "8"))

        def run_reps(C=C):
            for _ in range(reps):
                out = fused.median_rowsort_device(amj, ci,
                                                  max_count=max_count, C=C)
            np.asarray(out[0][:4])
            return out

        t0 = time.time()
        out = run()
        cold = time.time() - t0
        t, out = _bench(run, k=4)
        t_r, out = _bench(run_reps, k=3)
        a = np.asarray(out[0])
        if ref is None:
            ref = a
            tag = "(ref)"
        else:
            tag = "EXACT" if (a == ref).all() else "MISMATCH!"
        print(f"# C={C}: cold {cold:.1f}s warm {t * 1000:.1f}ms "
              f"amortized {t_r / reps * 1000:.1f}ms {tag}", file=sys.stderr)


if __name__ == "__main__":
    main()

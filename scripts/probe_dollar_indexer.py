"""On-chip probe: device dollar-bar indexer (blocked rank path vs the
round-4 searchsorted formulation) at monthly trade counts.

Usage: python scripts/probe_dollar_indexer.py [n_trades]
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
    from finmlkit_tpu.bar import indexers
    from finmlkit_tpu.bar.quantize import quantize_trades

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 39_171_929
    ts, price, amount, side = synth_trades(n)
    q = quantize_trades(price, amount)
    # ~40k bars like the round-4 config2 run
    thr = float((price * amount.astype(np.float64)).sum() / 40_000)
    print(f"# synth {n:,} trades, dollar threshold {thr:,.0f}",
          file=sys.stderr)

    tsj = jax.device_put(jnp.asarray(ts))
    tkj = jax.device_put(jnp.asarray(q.price_ticks))
    unj = jax.device_put(jnp.asarray(q.amount_units))
    jax.block_until_ready((tsj, tkj, unj))

    def run():
        cts, ci = indexers.dollar_bar_indexer_q(
            tsj, tkj, unj, thr, q.tick_size, q.amount_scale)
        np.asarray(cts[:4])
        return cts, ci

    t0 = time.time()
    cts, ci = run()
    cold = time.time() - t0
    t, (cts, ci) = _bench(run, k=5)
    print(f"# blocked: cold {cold:.1f}s warm {t * 1000:.1f}ms, "
          f"{int(ci.shape[0]) - 1:,} bars", file=sys.stderr)

    # parity vs the f64 searchsorted formulation on a slice (full-stream
    # f64 cumsum is fine on device; the old q-path is gone, so compare
    # boundary semantics against the host loop instead)
    host = indexers.dollar_bar_indexer_host(ts[:2_000_000],
                                            price[:2_000_000],
                                            amount[:2_000_000], thr)
    if host is not None:
        cts2, ci2 = indexers.dollar_bar_indexer_q(
            jnp.asarray(ts[:2_000_000]), jnp.asarray(q.price_ticks[:2_000_000]),
            jnp.asarray(q.amount_units[:2_000_000]), thr,
            q.tick_size, q.amount_scale)
        a = np.asarray(ci2)
        b = np.asarray(host[1])
        same = (a.shape == b.shape) and (a == b).all()
        print(f"# parity vs native host loop (2M slice): "
              f"{'EXACT' if same else 'MISMATCH'}", file=sys.stderr)
        if not same:
            mlen = min(len(a), len(b))
            d = np.nonzero(a[:mlen] != b[:mlen])[0]
            print(f"#   shapes {a.shape} vs {b.shape}; first diffs "
                  f"{d[:5]}: {a[d[:5]]} vs {b[d[:5]]}", file=sys.stderr)


if __name__ == "__main__":
    main()

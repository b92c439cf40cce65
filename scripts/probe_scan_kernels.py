"""On-chip probe: rowtail scan kernel variants at monthly trade counts.

Times the BARE Pallas kernels (pre-built input planes, tiny-value fetch
as the completion signal) and checks v4 bit-identity vs v2 on the real
chip — the f32-matmul exactness argument (components < 2^23) must
survive the hardware's actual matmul path, not just interpret mode.

Usage: python scripts/probe_scan_kernels.py [n_trades] [kernels...]
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
    from finmlkit_tpu.ops import fused_scan as FS

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 39_171_929
    kernels = sys.argv[2:] or ["v2", "v4"]
    ts, price, amount, side = synth_trades(n)
    q = quantize_trades(price, amount)
    print(f"# synth {n:,} trades", file=sys.stderr)

    tsj = jax.device_put(jnp.asarray(ts))
    tkj = jax.device_put(jnp.asarray(q.price_ticks))
    unj = jax.device_put(jnp.asarray(q.amount_units))
    sdj = jax.device_put(jnp.asarray(side))
    jax.block_until_ready((tsj, tkj, unj, sdj))
    _, ci = time_bar_indexer(tsj, 60.0, ts_first=int(ts[0]),
                             ts_last_i=int(ts[-1]))
    ci = jax.block_until_ready(ci)
    print(f"# {int(ci.shape[0]) - 1:,} bars", file=sys.stderr)

    planes_in, _ = fused.prep_planes(tkj, unj, sdj, ci)
    planes_in = jax.block_until_ready(planes_in)

    from functools import partial as _p
    import jax.numpy as _jnp
    stacked = None
    if any(k.startswith("ioS") for k in kernels):
        stacked = jax.block_until_ready(_jnp.stack(planes_in))

    def _ioS(*_planes, block_rows=512, **kw):
        return FS.bar_scan_io_floor_stacked(stacked,
                                            block_rows=block_rows, **kw)

    def _iok(k):
        def f(*planes, **kw):
            return FS.bar_scan_io_floor_k(planes[0], k=k, **kw)
        return f

    fns = {"v2": FS.bar_scan_rowtails, "v3": FS.bar_scan_rowtails_v3,
           "ioS": _ioS, "io1": _iok(1), "io2": _iok(2), "io4": _iok(4),
           "io8": _iok(8),
           "v4": FS.bar_scan_rowtails_v4,
           "v4r32": _p(FS.bar_scan_rowtails_v4, block_rows=32),
           "v4r64": _p(FS.bar_scan_rowtails_v4, block_rows=64),
           "v4r128": _p(FS.bar_scan_rowtails_v4, block_rows=128),
           "v4r512": _p(FS.bar_scan_rowtails_v4, block_rows=512),
           "v4dots": _p(FS.bar_scan_rowtails_v4, red_dots=True),
           "v4dotsr64": _p(FS.bar_scan_rowtails_v4, red_dots=True,
                           block_rows=64),
           "v4dotsr128": _p(FS.bar_scan_rowtails_v4, red_dots=True,
                            block_rows=128),
           "io": FS.bar_scan_io_floor,
           "io256": _p(FS.bar_scan_io_floor, block_rows=256),
           "io1024": _p(FS.bar_scan_io_floor, block_rows=1024)}
    reps = int(os.environ.get("PROBE_REPS", "8"))
    outs = {}
    for name in kernels:
        fn = fns[name]

        def run(fn=fn):
            out = fn(*planes_in)
            np.asarray(out[:1, :4])  # tiny fetch = completion signal
            return out

        def run_reps(fn=fn):
            # amortize the ~tens-of-ms tunnel fetch latency over `reps`
            # back-to-back dispatches: the queue drains at device speed
            for _ in range(reps):
                out = fn(*planes_in)
            np.asarray(out[:1, :4])
            return out

        t0 = time.time()
        out = run()
        cold = time.time() - t0
        t, out = _bench(run, k=5)
        t_r, out = _bench(run_reps, k=3)
        outs[name] = out
        print(f"# {name}: cold {cold:.1f}s warm {t * 1000:.1f}ms "
              f"amortized {t_r / reps * 1000:.1f}ms/dispatch (x{reps})",
              file=sys.stderr)

    ref_name = kernels[0]
    a = np.asarray(outs[ref_name])
    ok = True
    for name in kernels[1:]:
        b = np.asarray(outs[name])
        if (a == b).all():
            print(f"# {name} BIT-IDENTICAL to {ref_name} on chip",
                  file=sys.stderr)
        else:
            bad = np.argwhere(a != b)
            lanes = sorted(set(bad[:, 1].tolist()))
            inv = {v: k for k, v in FS.ROWTAIL_LANES.items()}
            print(f"# {name} MISMATCH vs {ref_name}: {len(bad)} cells, "
                  f"lanes {[(l, inv.get(l)) for l in lanes][:8]}",
                  file=sys.stderr)
            ok = False
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

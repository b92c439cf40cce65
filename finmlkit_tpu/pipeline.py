"""Device-resident combined pipeline: bars -> features in one chain.

The round-4 combined benchmark (BENCH_EXTRA config5) paid a full host
round-trip between the bar build and the feature kit: finished bar
columns were read back, re-packed on the host, and re-uploaded through
the transport (~57 ms put + ~43 ms readback at 45.7k bars — more than
the feature compute itself). The reference chains these stages in-memory
for free (/root/reference/finmlkit/feature/kit.py:1014-1085,
label/kit.py:272-313).

Here the chain stays on the device: the packed bar-products program's
output buffers feed a tiny f64 column jit (same empty-bar fixups as
bar/fused._convert_host), whose outputs feed the whole-graph feature
program (feature/fuse.FusedGraph.run_device) — no host hop between
stages; every readback (bar buffers, medians, feature buffers) is
started asynchronously and drained once at the end. CUSUM event
sampling and triple-barrier labeling consume the bar closes on the host
(they are microsecond-scale native scans over ~45k bars, see
sampling/filters.py).
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .bar.fused import (_start_host_copies, _unpack_raw, _convert_host,
                        fused_packed_v2_device, median_rowsort_device)

__all__ = ["bar_feature_pipeline_device", "bar_cols_device"]


@jax.jit
def _bar_cols_jit(p64, p32, counts, tick_size, amount_scale):
    """Feature-ready f64 bar columns from the packed product buffers.

    Mirrors bar/fused._convert_host's empty-bar fixups (open/high/low
    fall back to the close; volume/vwap zero) so the device-resident
    feature graph sees EXACTLY the columns the host path would build.
    """
    vol_u, dollar_u = p64[0], p64[1]
    open_raw, high_t, low_t, close_t = p32[0], p32[1], p32[2], p32[3]
    empty = counts == 0
    ts64 = tick_size.astype(jnp.float64)
    asc = amount_scale.astype(jnp.float64)

    close = close_t.astype(jnp.float64) * ts64
    open_ = jnp.where(empty, close_t, open_raw).astype(jnp.float64) * ts64
    high = jnp.where(empty, close_t, high_t).astype(jnp.float64) * ts64
    low = jnp.where(empty, close_t, low_t).astype(jnp.float64) * ts64
    volf = vol_u.astype(jnp.float64) * asc
    vol = jnp.where(empty, 0.0, volf)
    vwap = jnp.where(vol_u > 0,
                     dollar_u.astype(jnp.float64)
                     / jnp.where(vol_u > 0, vol_u, 1).astype(jnp.float64)
                     * ts64, 0.0)
    return {
        "open": open_, "high": high, "low": low, "close": close,
        # the host path stores volume as float32 and the feature frame
        # upcasts it back — replicate the rounding for parity
        "volume": vol.astype(jnp.float32).astype(jnp.float64),
        "vwap": vwap,
        "trades": counts,
    }


def bar_cols_device(bufs, ci, tick_size, amount_scale) -> Dict[str, jnp.ndarray]:
    """Device f64 bar columns from packed product buffers (tiny jit)."""
    p64, p32, _ = bufs
    counts = jnp.diff(ci)
    return _bar_cols_jit(p64, p32, counts,
                         jnp.float64(tick_size), jnp.float64(amount_scale))


def bar_feature_pipeline_device(price_ticks, amount_units, ci, sides, *,
                                tick_size, amount_scale, graph,
                                bar_ts=None, amounts_f32=None,
                                ci_host=None, max_count=None,
                                interpret: bool = False,
                                scan_kernel: str = "v2",
                                debug_timing: bool = False):
    """Bars + medians + whole-graph features with NO host hop between
    stages.

    :param graph: a compiled :class:`finmlkit_tpu.feature.fuse.FusedGraph`
        whose planned input columns are a subset of the bar columns
        produced by :func:`bar_cols_device` (open/high/low/close/volume/
        vwap/trades).
    :param bar_ts: optional device int64 ns timestamps per bar (for
        time-aware transforms).
    :returns: (ohlcv dict, directional dict, features dict) — host numpy.
    """
    import time as _time

    def _sync(x, tag):
        # debug_timing="sync" mode: serialize stages to attribute time
        if debug_timing == "sync":
            import sys
            t = _time.time()
            jax.block_until_ready(x)
            np_probe = jax.tree_util.tree_leaves(x)[0][:1]
            np.asarray(np_probe)
            print(f"#     sync {tag}: {_time.time() - t:.3f}s",
                  file=sys.stderr)

    t0 = _time.time()
    bufs = fused_packed_v2_device(price_ticks, amount_units, ci, sides,
                                  interpret=interpret, kernel=scan_kernel)
    _sync(bufs, "products")
    # feature graph queued BEFORE the median program: features depend
    # only on the product buffers, so their readback DMA drains while
    # the (independent) median sort still occupies the core
    cols = bar_cols_device(bufs, ci, tick_size, amount_scale)
    _sync(cols, "cols")
    t1 = _time.time()
    fpacked, layout = graph.run_device(cols, ts=bar_ts, as_numpy=False)
    _sync(fpacked, "features")
    med = None
    if amounts_f32 is not None:
        med = median_rowsort_device(amounts_f32, ci, interpret=interpret,
                                    max_count=max_count)
        _sync(med, "medians")
    t2 = _time.time()

    to_copy = tuple(bufs) + (tuple(med) if med is not None else ()) \
        + tuple(fpacked.values())
    _start_host_copies(to_copy)

    raw = _unpack_raw(bufs, ci_host if ci_host is not None else ci)
    if med is None:
        n_bars = raw[4].shape[0]
        med_np = (np.zeros(n_bars, np.float32), np.zeros(n_bars, np.float32))
    else:
        med_np = (np.asarray(med[0]), np.asarray(med[1]))
    ohlcv, direc = _convert_host(raw, med_np, tick_size, amount_scale)
    t3 = _time.time()

    packed_np = jax.device_get(fpacked)
    if debug_timing:
        import sys
        print(f"#   pipeline stages: dispatch(bars+cols) {t1-t0:.3f}s "
              f"feat-dispatch {t2-t1:.3f}s products-drain {t3-t2:.3f}s "
              f"feat-drain {_time.time()-t3:.3f}s", file=sys.stderr)
    counters: Dict[str, int] = {}
    feats = {}
    for key, col in layout:
        i = counters.get(key, 0)
        counters[key] = i + 1
        feats[col] = packed_np[key][i]
    return ohlcv, direc, feats

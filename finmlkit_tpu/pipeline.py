"""Device-resident combined pipeline: bars -> features in one chain.

The round-4 combined benchmark (BENCH_EXTRA config5) paid a full host
round-trip between the bar build and the feature kit: finished bar
columns were read back, re-packed on the host, and re-uploaded through
the transport (~57 ms put + ~43 ms readback at 45.7k bars — more than
the feature compute itself). The reference chains these stages in-memory
for free (/root/reference/finmlkit/feature/kit.py:1014-1085,
label/kit.py:272-313).

Here the chain stays on the device: the single final-dtype bar-products
buffer (bar/fused._fused_packed_final_jit — f64 conversion on device,
one ~3.9 MB readback) feeds a tiny f64 column jit whose outputs feed
the whole-graph feature program (feature/fuse.FusedGraph.run_device) —
no host hop between stages; every readback (bar buffer, medians,
feature buffers) is started asynchronously and drained once at the end.
The dispatch/drain split lets callers pipeline consecutive months
(dispatch month i+1 before draining month i). CUSUM event sampling and
triple-barrier labeling consume the bar closes on the host (they are
microsecond-scale native scans over ~45k bars, see sampling/filters.py).
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .bar.fused import (_FINAL_ROWS, _assemble_final,
                        _fused_packed_final_jit, _n_rows,
                        _start_host_copies, median_rowsort_device)

__all__ = ["bar_feature_pipeline_device", "bar_feature_dispatch",
           "bar_feature_drain", "bar_cols_from_final"]

_ROW_IDX = {name: i for i, name in enumerate(_FINAL_ROWS)}


@jax.jit
def _cols_from_final_jit(buf, counts, tick_size, amount_scale):
    """Feature-ready f64 bar columns from the final-dtype buffer.

    The buffer rows already carry the empty-bar fixups (open/high/low
    fall back to the close), so the columns match the host path's
    DataFrame bit-for-bit.
    """
    ts64 = tick_size.astype(jnp.float64)
    asc = amount_scale.astype(jnp.float64)

    def row(name):
        return buf[_ROW_IDX[name]]

    def pair(hi, lo):
        return (row(hi).astype(jnp.int64) << 32) | \
            row(lo).astype(jnp.uint32).astype(jnp.int64)

    vol_u = pair("vol_hi", "vol_lo")
    dollar_u = pair("dol_hi", "dol_lo")
    empty = counts == 0
    vol = vol_u.astype(jnp.float64) * asc
    vwap = jnp.where(vol_u > 0,
                     dollar_u.astype(jnp.float64)
                     / jnp.where(vol_u > 0, vol_u, 1).astype(jnp.float64)
                     * ts64, 0.0)
    return {
        "open": row("open_t").astype(jnp.float64) * ts64,
        "high": row("high_t").astype(jnp.float64) * ts64,
        "low": row("low_t").astype(jnp.float64) * ts64,
        "close": row("close_t").astype(jnp.float64) * ts64,
        # the host path stores volume as float32 and the feature frame
        # upcasts it back — replicate the rounding for parity
        "volume": jnp.where(empty, 0.0, vol).astype(jnp.float32)
                     .astype(jnp.float64),
        "vwap": jnp.where(empty, 0.0, vwap),
        "trades": counts,
    }


def bar_cols_from_final(buf, ci, tick_size, amount_scale) -> Dict[str, jnp.ndarray]:
    return _cols_from_final_jit(buf, jnp.diff(ci),
                                jnp.float64(tick_size),
                                jnp.float64(amount_scale))


def bar_feature_dispatch(price_ticks, amount_units, ci, sides, *,
                         tick_size, amount_scale, graph, bar_ts=None,
                         amounts_f32=None, max_count=None,
                         interpret: bool = False,
                         scan_kernel: str = "v4",
                         feat_dtype=None):
    """Queue the full device chain (bars -> medians -> features) and
    start every readback DMA; returns opaque handles for
    :func:`bar_feature_drain`. Nothing blocks."""
    n = int(price_ticks.shape[0])
    buf = _fused_packed_final_jit(price_ticks, amount_units, sides, ci,
                                  jnp.float64(tick_size),
                                  jnp.float64(amount_scale),
                                  _n_rows(n) * 128, interpret,
                                  scan_kernel)
    cols = bar_cols_from_final(buf, ci, tick_size, amount_scale)
    if feat_dtype is not None:
        cols = {k: (v.astype(feat_dtype) if v.dtype == jnp.float64 else v)
                for k, v in cols.items()}
    fpacked, layout = graph.run_device(cols, ts=bar_ts, as_numpy=False)
    med = None
    if amounts_f32 is not None:
        med = median_rowsort_device(amounts_f32, ci, interpret=interpret,
                                    max_count=max_count)
    to_copy = (buf,) + tuple(fpacked.values()) \
        + (tuple(med) if med is not None else ())
    _start_host_copies(to_copy)
    return buf, med, fpacked, layout


def bar_feature_drain(handles, ci_host, tick_size, amount_scale):
    """Drain all readbacks; returns (ohlcv, directional, features)."""
    buf, med, fpacked, layout = handles
    if med is None:
        n_bars = int(buf.shape[1])
        med_np = (np.zeros(n_bars, np.float32),
                  np.zeros(n_bars, np.float32))
    else:
        med_np = (np.asarray(med[0]), np.asarray(med[1]))
    ohlcv, direc = _assemble_final(buf, ci_host, med_np, tick_size,
                                   amount_scale)
    packed_np = jax.device_get(fpacked)
    counters: Dict[str, int] = {}
    feats = {}
    for key, col in layout:
        i = counters.get(key, 0)
        counters[key] = i + 1
        feats[col] = packed_np[key][i]
    return ohlcv, direc, feats


def bar_feature_pipeline_device(price_ticks, amount_units, ci, sides, *,
                                tick_size, amount_scale, graph,
                                bar_ts=None, amounts_f32=None,
                                ci_host=None, max_count=None,
                                interpret: bool = False,
                                scan_kernel: str = "v4",
                                feat_dtype=None,
                                debug_timing: bool = False):
    """Bars + medians + whole-graph features with NO host hop between
    stages (one dispatch pass, one drain pass).

    :param graph: a compiled :class:`finmlkit_tpu.feature.fuse.FusedGraph`
        whose planned input columns are a subset of the bar columns
        (open/high/low/close/volume/vwap/trades).
    :param bar_ts: optional device int64 ns timestamps per bar.
    :param feat_dtype: cast the f64 feature inputs to this dtype before
        the graph (e.g. jnp.float32 — the TPU fast path; f64 is
        emulated on TPU).
    :returns: (ohlcv dict, directional dict, features dict) — host numpy.
    """
    handles = bar_feature_dispatch(
        price_ticks, amount_units, ci, sides, tick_size=tick_size,
        amount_scale=amount_scale, graph=graph, bar_ts=bar_ts,
        amounts_f32=amounts_f32, max_count=max_count, interpret=interpret,
        scan_kernel=scan_kernel, feat_dtype=feat_dtype)
    return bar_feature_drain(handles,
                             ci_host if ci_host is not None else ci,
                             tick_size, amount_scale)

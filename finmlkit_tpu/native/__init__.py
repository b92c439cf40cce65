"""Native host kernel library (C++ via ctypes).

Compiles ``seg_stats.cpp`` on first use with the system ``g++`` into the
package directory (falling back to a per-user cache dir if the package
is not writable) and binds it with ctypes. Every consumer degrades
gracefully to its pure-JAX/NumPy path when the toolchain is missing —
``lib()`` simply returns None.

Why native code here: per-bar order statistics and event scans are
latency-bound, branchy, cache-resident workloads — the reference runs
them as Numba machine code on the host (np.median per bar inside
comp_bar_ohlcv, /root/reference/finmlkit/bar/base.py:306-407), and the
TPU is the wrong engine for them. The device keeps the bandwidth-bound
reductions; the host runs these overlapped (see bar/fused.py).
"""
import ctypes
import os
import subprocess
import sys
import tempfile
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "seg_stats.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _so_path() -> str:
    tag = f"cpython{sys.version_info.major}{sys.version_info.minor}"
    return os.path.join(os.path.dirname(__file__), f"_seg_stats_{tag}.so")


def _build(so: str) -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def lib():
    """The loaded native library, building it if needed; None if the
    toolchain is unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _so_path()
        if not os.path.exists(so) or (os.path.getmtime(so) < os.path.getmtime(_SRC)):
            target = so
            if not _build(target):
                target = os.path.join(tempfile.gettempdir(),
                                      os.path.basename(so))
                if not (os.path.exists(target) or _build(target)):
                    return None
            so = target
        try:
            L = ctypes.CDLL(so)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        L.seg_median_pair.argtypes = [f32p, i64p, ctypes.c_int64, f32p, f32p,
                                      ctypes.c_int]
        L.seg_median_pair.restype = None
        L.seg_bar_stats.argtypes = [f32p, i64p, ctypes.c_int64, f64p,
                                    ctypes.c_double, f32p, f32p, f32p, f32p,
                                    i64p, f64p, f64p, f64p, ctypes.c_int]
        L.seg_bar_stats.restype = None
        L.cusum_filter_events.argtypes = [f64p, f64p, ctypes.c_int64, i64p]
        L.cusum_filter_events.restype = ctypes.c_int64
        L.cusum_bar_boundaries.argtypes = [f64p, f64p, i64p, ctypes.c_int64,
                                           ctypes.c_int64, i64p, ctypes.c_int64]
        L.cusum_bar_boundaries.restype = ctypes.c_int64
        L.volume_bar_boundaries.argtypes = [f32p, ctypes.c_int64,
                                            ctypes.c_double, i64p,
                                            ctypes.c_int64]
        L.volume_bar_boundaries.restype = ctypes.c_int64
        L.dollar_bar_boundaries.argtypes = [f64p, f32p, ctypes.c_int64,
                                            ctypes.c_double, i64p,
                                            ctypes.c_int64]
        L.dollar_bar_boundaries.restype = ctypes.c_int64
        _LIB = L
        return _LIB


def available() -> bool:
    """True when the native library is built (or buildable) and loaded."""
    return lib() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


_N_THREADS = max(os.cpu_count() or 1, 1)


def seg_median_pair(vals: np.ndarray, ci: np.ndarray):
    """Per-bar (lower, upper) median values over ranges (ci[i], ci[i+1]].

    Returns None when the native library is unavailable.
    """
    L = lib()
    if L is None:
        return None
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    ci = np.ascontiguousarray(ci, dtype=np.int64)
    n_bars = len(ci) - 1
    med_a = np.empty(n_bars, np.float32)
    med_b = np.empty(n_bars, np.float32)
    L.seg_median_pair(_ptr(vals, ctypes.c_float), _ptr(ci, ctypes.c_int64),
                      n_bars, _ptr(med_a, ctypes.c_float),
                      _ptr(med_b, ctypes.c_float), _N_THREADS)
    return med_a, med_b


def seg_bar_stats(vals: np.ndarray, ci: np.ndarray, thr=None, q: float = 0.95):
    """Fused per-bar stats over ranges (ci[i], ci[i+1]]: median bracket,
    q-percentile bracket, f64 sum / sum-of-squares, and (when ``thr`` is
    given) the block volume ``sum(v for v in bar if v > thr[i])``.

    Returns a dict of per-bar arrays, or None when the native library is
    unavailable.
    """
    L = lib()
    if L is None:
        return None
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    ci = np.ascontiguousarray(ci, dtype=np.int64)
    n_bars = len(ci) - 1
    med_a = np.empty(n_bars, np.float32)
    med_b = np.empty(n_bars, np.float32)
    q_a = np.empty(n_bars, np.float32)
    q_b = np.empty(n_bars, np.float32)
    q_lo = np.empty(n_bars, np.int64)
    s = np.empty(n_bars, np.float64)
    ss = np.empty(n_bars, np.float64)
    blk = np.empty(n_bars, np.float64)
    thr_p = None
    if thr is not None:
        thr_arr = np.ascontiguousarray(thr, dtype=np.float64)
        thr_p = _ptr(thr_arr, ctypes.c_double)
    L.seg_bar_stats(_ptr(vals, ctypes.c_float), _ptr(ci, ctypes.c_int64),
                    n_bars, thr_p, float(q),
                    _ptr(med_a, ctypes.c_float), _ptr(med_b, ctypes.c_float),
                    _ptr(q_a, ctypes.c_float), _ptr(q_b, ctypes.c_float),
                    _ptr(q_lo, ctypes.c_int64), _ptr(s, ctypes.c_double),
                    _ptr(ss, ctypes.c_double), _ptr(blk, ctypes.c_double),
                    _N_THREADS)
    return {"med_a": med_a, "med_b": med_b, "q_a": q_a, "q_b": q_b,
            "q_lo": q_lo, "sum": s, "sumsq": ss,
            "block_sum": blk if thr is not None else None, "q": q}


def cusum_filter_events(log_ret: np.ndarray, thr: np.ndarray):
    """Symmetric CUSUM filter events (exact f64 reference semantics)."""
    L = lib()
    if L is None:
        return None
    log_ret = np.ascontiguousarray(log_ret, dtype=np.float64)
    thr = np.ascontiguousarray(thr, dtype=np.float64)
    n = len(log_ret)
    out = np.empty(n, np.int64)
    k = L.cusum_filter_events(_ptr(log_ret, ctypes.c_double),
                              _ptr(thr, ctypes.c_double), n,
                              _ptr(out, ctypes.c_int64))
    return out[:k].copy()


def cusum_bar_boundaries(rets, lam, ts, start: int, max_bars: int):
    L = lib()
    if L is None:
        return None
    rets = np.ascontiguousarray(rets, dtype=np.float64)
    lam = np.ascontiguousarray(lam, dtype=np.float64)
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    out = np.empty(max_bars, np.int64)
    k = L.cusum_bar_boundaries(_ptr(rets, ctypes.c_double),
                               _ptr(lam, ctypes.c_double),
                               _ptr(ts, ctypes.c_int64), len(rets),
                               int(start), _ptr(out, ctypes.c_int64),
                               int(max_bars))
    return out[:k].copy()


def volume_bar_boundaries(volumes, threshold: float, max_bars: int):
    L = lib()
    if L is None:
        return None
    volumes = np.ascontiguousarray(volumes, dtype=np.float32)
    out = np.empty(max_bars, np.int64)
    k = L.volume_bar_boundaries(_ptr(volumes, ctypes.c_float), len(volumes),
                                float(threshold), _ptr(out, ctypes.c_int64),
                                int(max_bars))
    return out[:k].copy()


def dollar_bar_boundaries(prices, volumes, threshold: float, max_bars: int):
    L = lib()
    if L is None:
        return None
    prices = np.ascontiguousarray(prices, dtype=np.float64)
    volumes = np.ascontiguousarray(volumes, dtype=np.float32)
    out = np.empty(max_bars, np.int64)
    k = L.dollar_bar_boundaries(_ptr(prices, ctypes.c_double),
                                _ptr(volumes, ctypes.c_float), len(prices),
                                float(threshold), _ptr(out, ctypes.c_int64),
                                int(max_bars))
    return out[:k].copy()

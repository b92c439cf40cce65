"""Volume-flow kernels: flow acceleration, VPIN, rolling volume profile.

Parity: /root/reference/finmlkit/feature/core/volume.py. The rolling
volume profile operates on the *dense* footprint tensors of
``finmlkit_tpu.bar.footprint`` instead of ragged NumbaLists: window
aggregation is a masked matmul-like reduction over (bars x levels),
bucketing is a segment-sum over the level axis, and the POC/value-area
expansion is a short lax.while_loop vmapped across bars.
"""
from functools import partial

import jax
import jax.numpy as jnp

from ...config import feature_dtype as _fdt

from ._rolling import roll_sum, warmup_nan


@partial(jax.jit, static_argnames=("window", "recent_periods"))
def _flow_acc_impl(volumes, window: int, recent_periods: int):
    eps = 1e-12
    recent = roll_sum(volumes, recent_periods)
    full = roll_sum(volumes, window)
    past = full - recent
    out = jnp.log((recent + eps) / (past + eps))
    return warmup_nan(out, window)


def comp_flow_acceleration(volumes, window: int, recent_periods: int):
    """log(recent volume sum / past volume sum). Parity: core/volume.py:572-607."""
    volumes = jnp.asarray(volumes, _fdt())
    if volumes.shape[0] < window or recent_periods >= window:
        return jnp.full_like(volumes, jnp.nan)
    return _flow_acc_impl(volumes, int(window), int(recent_periods))


@partial(jax.jit, static_argnames=("window",))
def _vpin_impl(vb, vs, window: int):
    isnan = jnp.isnan(vb) | jnp.isnan(vs)
    z = lambda x: jnp.where(isnan, 0.0, x)
    buy = roll_sum(z(vb), window)
    sell = roll_sum(z(vs), window)
    imb = roll_sum(z(jnp.abs(vb - vs)), window)
    nan_cnt = roll_sum(isnan.astype(jnp.float64), window)
    tot = buy + sell
    out = jnp.where((nan_cnt == 0) & (tot > 1e-9), imb / tot, jnp.nan)
    return warmup_nan(out, window).astype(jnp.float32)


def vpin(volume_buy, volume_sell, window: int):
    """Rolling |buy-sell| / (buy+sell) with NaN-window invalidation.

    Parity: core/volume.py:610-641.
    """
    return _vpin_impl(jnp.asarray(volume_buy, _fdt()),
                      jnp.asarray(volume_sell, _fdt()), int(window))


# ---------------------------------------------------------------------------
# Rolling volume profile over dense footprints
# ---------------------------------------------------------------------------

def _poc_hva_lva_single(levels, volumes, va_pct):
    """Value-area expansion for one profile (levels ascending, padded with
    zero volume). Parity: core/volume.py:277-364 — expands from the POC
    two levels at a time toward the side with more volume.
    """
    n_levels = levels.shape[0]
    total = jnp.sum(volumes)
    poc_idx = jnp.argmax(volumes)
    va_thrs = total * (va_pct / 100.0)

    def pair_vol_up(i):
        v = jnp.where(i < n_levels, volumes[jnp.clip(i, 0, n_levels - 1)], 0.0)
        v2 = jnp.where(i + 1 < n_levels, volumes[jnp.clip(i + 1, 0, n_levels - 1)], 0.0)
        return jnp.where(i < n_levels, v + v2, -1.0)

    def pair_vol_down(i):
        v = jnp.where(i >= 0, volumes[jnp.clip(i, 0, n_levels - 1)], 0.0)
        v2 = jnp.where(i - 1 >= 0, volumes[jnp.clip(i - 1, 0, n_levels - 1)], 0.0)
        return jnp.where(i >= 0, v + v2, -1.0)

    def cond(state):
        cum, up_idx, down_idx, hva, lva, stuck = state
        return (cum < va_thrs) & ~stuck

    def body(state):
        cum, up_idx, down_idx, hva, lva, _ = state
        cu = pair_vol_up(up_idx)
        cd = pair_vol_down(down_idx)
        go_up = cu > cd
        go_down = cu < cd
        both = (cu == cd) & (cu != -1.0)
        stuck = ~(go_up | go_down | both)
        new_cum = cum + jnp.where(go_up, cu,
                         jnp.where(go_down, cd,
                         jnp.where(both, cu + cd, 0.0)))
        new_hva = jnp.where(go_up | both,
                            levels[jnp.minimum(up_idx + 1, n_levels - 1)], hva)
        new_lva = jnp.where(go_down | both,
                            levels[jnp.maximum(down_idx - 1, 0)], lva)
        new_up = jnp.where(go_up | both, up_idx + 2, up_idx)
        new_down = jnp.where(go_down | both, down_idx - 2, down_idx)
        return (new_cum, new_up, new_down, new_hva, new_lva, stuck)

    poc_price = levels[poc_idx]
    init = (volumes[poc_idx], poc_idx + 1, poc_idx - 1,
            poc_price, poc_price, jnp.bool_(False))
    _, _, _, hva, lva, _ = jax.lax.while_loop(cond, body, init)

    above = jnp.where(levels > poc_price, volumes, 0.0).sum()
    pct_above = jnp.where((total > 0) & (above > 0), above / total, 0.0)
    return poc_price, hva, lva, pct_above


@partial(jax.jit, static_argnames=("n_bins",))
def _bucket_profile(levels, volumes, n_bins: int):
    """Bucket an ascending level axis into ~n_bins odd-width bins.

    Parity: core/volume.py:206-274. Returns (binned_levels,
    binned_volumes) padded to the input length with zero volume.
    """
    L = levels.shape[0]
    vmask = volumes > 0
    # active range [min_price, max_price] of nonzero-volume levels
    min_price = jnp.min(jnp.where(vmask, levels, jnp.iinfo(jnp.int32).max))
    max_price = jnp.max(jnp.where(vmask, levels, jnp.iinfo(jnp.int32).min))
    price_range = max_price - min_price
    bin_width = jnp.maximum(1, price_range // n_bins)
    bin_width = jnp.where(bin_width % 2 == 0, bin_width + 1, bin_width)
    bin_idx = jnp.clip((levels - min_price) // bin_width, 0, L - 1)
    binned_vol = jax.ops.segment_sum(jnp.where(vmask, volumes, 0.0),
                                     bin_idx, num_segments=L)
    # midpoint of each bin (last bin may be the leftover -> max_price)
    k = jnp.arange(L, dtype=jnp.int32)
    edges_lo = min_price + k * bin_width
    mid = edges_lo + (bin_width - 1) // 2
    # number of regular (midpoint-labeled) bins; when the range divides
    # evenly the level at max_price spills into a leftover bin labeled
    # max_price (reference volume.py:246-259)
    n_full = jnp.maximum((price_range + bin_width - 1) // bin_width, 1)
    binned_levels = jnp.where(k < n_full, mid,
                              jnp.where(k == n_full, max_price, edges_lo))
    return binned_levels.astype(jnp.int32), binned_vol


@partial(jax.jit, static_argnames=("max_levels", "n_bins", "max_window_bars"))
def _volume_profile_rolling_impl(ts, low_level, n_levels, total_vol_dense,
                                 window_ns, va_pct, max_levels: int,
                                 n_bins: int | None, max_window_bars: int):
    """Rolling window profile over dense per-bar footprints.

    For each bar i, aggregate the footprints of the (at most
    ``max_window_bars``) bars within the trailing time window onto a
    unified tick grid of static width ``max_levels`` anchored at the
    window's min level, then run POC/value-area. Work is
    O(n_bars * max_window_bars * L), matching the reference's rolling
    loop, but each window is one vectorized scatter.
    """
    n_bars = ts.shape[0]
    L = total_vol_dense.shape[1]
    W = max_window_bars

    start_idx = jnp.searchsorted(ts, ts - window_ns, side="left")
    # reference: windows slice [searchsorted(start), searchsorted(end, right))
    # with end_ts = ts[i]  ->  bars j in [start_idx[i], i]

    def one_bar(i):
        s = start_idx[i]
        base = jnp.clip(i - W + 1, 0, jnp.maximum(n_bars - W, 0))
        rows = jnp.arange(W) + base                       # absolute bar ids
        in_win = (rows >= s) & (rows <= i)
        lo_w = jax.lax.dynamic_slice(low_level, (base,), (W,))
        nl_w = jax.lax.dynamic_slice(n_levels, (base,), (W,))
        vol_w = jax.lax.dynamic_slice(total_vol_dense, (base, 0), (W, L))
        lo = jnp.min(jnp.where(in_win, lo_w, jnp.iinfo(jnp.int32).max))
        offs = lo_w - lo                                  # (W,)
        cols = jnp.arange(L)
        tgt = jnp.clip(offs[:, None] + cols[None, :], 0, max_levels - 1)
        w = jnp.where(in_win[:, None] & (cols[None, :] < nl_w[:, None]),
                      vol_w, 0.0)
        grid = jax.ops.segment_sum(w.reshape(-1), tgt.reshape(-1),
                                   num_segments=max_levels)
        levels = lo + jnp.arange(max_levels, dtype=jnp.int32)
        if n_bins is not None:
            levels, grid = _bucket_profile(levels, grid, n_bins)
        return _poc_hva_lva_single(levels, grid, va_pct)

    idxs = jnp.arange(n_bars)
    poc, hva, lva, pct = jax.lax.map(one_bar, idxs, batch_size=64)
    first = jnp.searchsorted(ts, ts[0] + window_ns)
    ok = idxs >= first
    z32 = jnp.int32(0)
    return (jnp.where(ok, poc, z32).astype(jnp.int32),
            jnp.where(ok, hva, z32).astype(jnp.int32),
            jnp.where(ok, lva, z32).astype(jnp.int32),
            jnp.where(ok, pct, 0.0).astype(jnp.float32))


def volume_profile_rolling(ts, low_level, n_levels, buy_dense, sell_dense,
                           window_size_sec, n_bins=None, va_pct: float = 68.34,
                           max_levels: int | None = None):
    """Rolling POC/HVA/LVA/pct-above-POC over dense footprints.

    Parity: core/volume.py:393-456 with the dense data model. Values
    before the first full window are 0 (callers convert to NaN), as in
    the reference.
    """
    ts = jnp.asarray(ts, jnp.int64)
    total = jnp.asarray(buy_dense, jnp.float64) + jnp.asarray(sell_dense, jnp.float64)
    nl = jnp.asarray(n_levels, jnp.int32)
    lo = jnp.asarray(low_level, jnp.int32)
    window_ns = int(window_size_sec * 1e9)
    import numpy as _np
    ts_h = _np.asarray(ts)
    start_h = _np.searchsorted(ts_h, ts_h - window_ns, side="left")
    max_window_bars = int((_np.arange(len(ts_h)) - start_h + 1).max())
    if max_levels is None:
        # upper bound on the union grid of any window: trailing W-bar
        # rolling extrema (windows clipped by time can only be narrower)
        from scipy.ndimage import maximum_filter1d, minimum_filter1d
        lo_h = _np.asarray(lo)
        hi_h = lo_h + _np.asarray(nl)
        W = max_window_bars
        orig = -((W - 1) // 2)  # causal: window [i-W+1, i]
        hi_roll = maximum_filter1d(hi_h, size=W, mode="nearest", origin=orig)
        lo_roll = minimum_filter1d(lo_h, size=W, mode="nearest", origin=orig)
        max_levels = max(int((hi_roll - lo_roll).max()), int(total.shape[1]))
    return _volume_profile_rolling_impl(
        ts, lo, nl, total, jnp.int64(window_ns),
        jnp.float64(va_pct), int(max_levels),
        int(n_bins) if n_bins is not None else None, max_window_bars)


class VolumePro:
    """Rolling volume-profile calculator over dense footprints.

    Parity: /root/reference/finmlkit/feature/core/volume.py:13-130
    (VolumePro wrapper) operating on the dense FootprintData of
    finmlkit_tpu.bar.data_model instead of NumbaLists.
    """

    def __init__(self, window_size, n_bins: int = 27, va_pct: float = 68.34):
        import pandas as pd
        if hasattr(window_size, "total_seconds"):
            self.window_size_sec = window_size.total_seconds()
        else:
            self.window_size_sec = float(window_size)
        self.n_bins = n_bins
        self.va_pct = va_pct

    def reset_parameters(self, window_size_sec=None, n_bins=None, va_pct=None):
        if window_size_sec is not None:
            self.window_size_sec = window_size_sec
        if n_bins is not None:
            self.n_bins = n_bins
        if va_pct is not None:
            self.va_pct = va_pct

    def compute(self, bars, fp_data):
        """POC / HVA / LVA prices + volume pct above POC per bar.

        :param bars: DataFrame with 'high'/'low' columns (unused in the
            dense path — kept for API parity).
        :param fp_data: FootprintData (dense).
        :returns: (poc_prices, hva_prices, lva_prices, vp_pct_above_poc)
            as numpy arrays, warm-up prefix set to NaN.
        """
        import numpy as np
        assert len(bars) == len(fp_data.bar_timestamps), \
            "Bars and footprint data should have the same length."
        poc, hva, lva, pct = volume_profile_rolling(
            fp_data.bar_timestamps, fp_data.low_level, fp_data.n_levels,
            fp_data.buy_volumes, fp_data.sell_volumes,
            window_size_sec=self.window_size_sec, n_bins=self.n_bins,
            va_pct=self.va_pct)
        poc = np.asarray(poc, dtype=np.float64) * fp_data.price_tick
        hva = np.asarray(hva, dtype=np.float64) * fp_data.price_tick
        lva = np.asarray(lva, dtype=np.float64) * fp_data.price_tick
        poc = np.where(poc == 0, np.nan, poc)
        hva = np.where(hva == 0, np.nan, hva)
        lva = np.where(lva == 0, np.nan, lva)
        return poc, hva, lva, np.asarray(pct)

    def compute_range(self, bars, fp_data, start, end):
        """Rolling profile restricted to [start, end] with window warm-up.

        Parity: core/volume.py:88-130.
        """
        import pandas as pd
        assert len(bars) == len(fp_data.bar_timestamps)
        start = pd.to_datetime(start)
        adjusted_start = start - pd.Timedelta(seconds=self.window_size_sec)
        sub = fp_data[adjusted_start:pd.to_datetime(end)]
        dt_idx = pd.to_datetime(sub.bar_timestamps)
        bars_sub = bars.loc[dt_idx]
        poc, hva, lva, pct = self.compute(bars_sub, sub)
        return sub.bar_timestamps, poc, hva, lva, pct


def volume_profile_developing(ts, low_level, n_levels, buy_dense, sell_dense,
                              start_ts: int, end_ts: int, n_bins=None,
                              va_pct: float = 68.34):
    """Developing (cumulative) volume profile between two timestamps.

    Parity: core/volume.py:492-569 — POC/HVA/LVA recomputed after each
    bar as footprints accumulate on a unified grid covering the range.
    Returns (timestamps, poc, hva, lva) in integer tick units.
    """
    import numpy as np
    ts_h = np.asarray(ts)
    start_idx = int(np.searchsorted(ts_h, start_ts))
    end_idx = int(np.searchsorted(ts_h, end_ts, side="right"))
    if end_idx <= start_idx:
        z = np.zeros(0, np.int32)
        return ts_h[0:0], z, z, z

    lo = np.asarray(low_level)[start_idx:end_idx]
    nl = np.asarray(n_levels)[start_idx:end_idx]
    bv = np.asarray(buy_dense)[start_idx:end_idx]
    sv = np.asarray(sell_dense)[start_idx:end_idx]
    g_lo = int(lo.min())
    g_hi = int((lo + nl).max()) - 1
    LG = g_hi - g_lo + 1
    nb = end_idx - start_idx

    grid = jnp.zeros((nb, LG), jnp.float32)
    rows = jnp.arange(nb)[:, None]
    cols = jnp.arange(bv.shape[1])[None, :]
    tgt = jnp.asarray(lo)[:, None] - g_lo + cols
    mask = cols < jnp.asarray(nl)[:, None]
    flat = jnp.where(mask, rows * LG + tgt, nb * LG)
    vals = jnp.where(mask, jnp.asarray(bv + sv), 0.0)
    grid = jax.ops.segment_sum(vals.reshape(-1), flat.reshape(-1),
                               num_segments=nb * LG + 1)[:-1].reshape(nb, LG)
    developing = jnp.cumsum(grid, axis=0)

    levels = jnp.asarray(g_lo + np.arange(LG), jnp.int32)

    def one(profile):
        lv, vol = (levels, profile)
        if n_bins is not None:
            lv, vol = _bucket_profile(lv, vol, int(n_bins))
        return _poc_hva_lva_single(lv, vol, va_pct)[:3]

    poc, hva, lva = jax.lax.map(one, developing, batch_size=64)
    return (ts_h[start_idx:end_idx], np.asarray(poc, dtype=np.int32),
            np.asarray(hva, dtype=np.int32), np.asarray(lva, dtype=np.int32))

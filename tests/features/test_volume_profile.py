"""Rolling volume-profile tests vs a sequential emulation of the
reference semantics (core/volume.py:133-456) on the dense footprint
data model."""
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.bar import TradesData, TimeBarKit
from finmlkit_tpu.feature.kernels.volume import VolumePro, volume_profile_rolling


@pytest.fixture
def fp_setup(trades_small):
    ts, px, amt, side = trades_small
    ids = np.arange(len(ts), dtype=np.int64)
    td = TradesData(ts, px, amt.astype(np.float32), ids,
                    timestamp_unit="ns", preprocess=True)
    kit = TimeBarKit(td, pd.Timedelta(minutes=2))
    bars = kit.build_ohlcv()
    fp = kit.build_footprints(price_tick_size=0.01)
    return bars, fp


def _seq_profile(fp, window_sec, va_pct=68.34):
    """Sequential emulation (no bucketing) of volume_profile_rolling."""
    ts = fp.bar_timestamps
    n = len(ts)
    poc = np.zeros(n, np.int64)
    hva = np.zeros(n, np.int64)
    lva = np.zeros(n, np.int64)
    pct = np.zeros(n, np.float64)
    w_ns = int(window_sec * 1e9)
    first = np.searchsorted(ts, ts[0] + w_ns)
    for i in range(first, n):
        s = np.searchsorted(ts, ts[i] - w_ns, side="left")
        e = i
        lo = fp.low_level[s:e + 1].min()
        hi = (fp.low_level[s:e + 1] + fp.n_levels[s:e + 1]).max() - 1
        grid = np.zeros(hi - lo + 1)
        for j in range(s, e + 1):
            nl = fp.n_levels[j]
            off = fp.low_level[j] - lo
            grid[off:off + nl] += (fp.buy_volumes[j, :nl].astype(np.float64)
                                   + fp.sell_volumes[j, :nl])
        levels = np.arange(lo, hi + 1)
        # POC + value-area expansion (reference comp_poc_hva_lva)
        total = grid.sum()
        pidx = int(np.argmax(grid))
        poc[i] = levels[pidx]
        thr = total * va_pct / 100.0
        cum = grid[pidx]
        hv = lv = levels[pidx]
        up, down = pidx + 1, pidx - 1
        nl_ = len(levels)

        def pair_up(u):
            if u >= nl_:
                return -1.0
            v = grid[u]
            if u + 1 < nl_:
                v += grid[u + 1]
            return v

        def pair_down(d):
            if d < 0:
                return -1.0
            v = grid[d]
            if d - 1 >= 0:
                v += grid[d - 1]
            return v

        while cum < thr:
            cu, cd = pair_up(up), pair_down(down)
            if cu > cd:
                cum += cu
                hv = levels[min(up + 1, nl_ - 1)]
                up += 2
            elif cu < cd:
                cum += cd
                lv = levels[max(down - 1, 0)]
                down -= 2
            elif cu == cd and cu != -1.0:
                cum += cu + cd
                hv = levels[min(up + 1, nl_ - 1)]
                lv = levels[max(down - 1, 0)]
                up += 2
                down -= 2
            else:
                break
        hva[i] = hv
        lva[i] = lv
        above = grid[levels > poc[i]].sum()
        pct[i] = above / total if total > 0 and above > 0 else 0.0
    return poc, hva, lva, pct


class TestVolumeProfileRolling:
    def test_vs_sequential(self, fp_setup):
        bars, fp = fp_setup
        window = 600.0  # 10 min
        got = volume_profile_rolling(
            fp.bar_timestamps, fp.low_level, fp.n_levels,
            fp.buy_volumes, fp.sell_volumes, window_size_sec=window,
            n_bins=None)
        poc_e, hva_e, lva_e, pct_e = _seq_profile(fp, window)
        poc, hva, lva, pct = (np.asarray(a) for a in got)
        np.testing.assert_array_equal(poc, poc_e)
        np.testing.assert_array_equal(hva, hva_e)
        np.testing.assert_array_equal(lva, lva_e)
        np.testing.assert_allclose(pct, pct_e, atol=1e-5)

    def test_volumepro_wrapper(self, fp_setup):
        bars, fp = fp_setup
        vp = VolumePro(pd.Timedelta(minutes=10), n_bins=None)
        poc, hva, lva, pct = vp.compute(bars, fp)
        assert len(poc) == len(bars)
        finite = np.isfinite(poc)
        assert finite.sum() > 0
        # POC lies within [LVA, HVA] envelope ordering... at least sane:
        assert (lva[finite] <= poc[finite] + 1e-9).mean() > 0.9

    def test_bucketing_runs(self, fp_setup):
        bars, fp = fp_setup
        vp = VolumePro(pd.Timedelta(minutes=10), n_bins=9)
        poc, hva, lva, pct = vp.compute(bars, fp)
        assert np.isfinite(poc).sum() > 0


class TestDeveloping:
    def test_developing_monotone_consistency(self, fp_setup):
        from finmlkit_tpu.feature.kernels.volume import volume_profile_developing
        bars, fp = fp_setup
        start = int(fp.bar_timestamps[1])
        end = int(fp.bar_timestamps[-2])
        ts_out, poc, hva, lva = volume_profile_developing(
            fp.bar_timestamps, fp.low_level, fp.n_levels,
            fp.buy_volumes, fp.sell_volumes, start, end)
        assert len(ts_out) == len(poc) == len(fp) - 2
        assert (lva <= poc).all() and (poc <= hva).all()
        # POC must be a level present in the range
        lo = fp.low_level[1:-1].min()
        hi = (fp.low_level[1:-1] + fp.n_levels[1:-1]).max() - 1
        assert ((poc >= lo) & (poc <= hi)).all()

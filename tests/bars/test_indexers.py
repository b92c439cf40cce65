"""Bar indexer semantics tests — hand-worked expectations per
/root/reference/finmlkit/bar/logic.py behavior."""
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.bar import indexers
import jax.numpy as jnp


def _seq_time_bar_reference(timestamps, interval_seconds):
    """Independent emulation of the reference clock arithmetic (f64)."""
    step = interval_seconds * 1e9
    start = np.float64(timestamps[0]) // step * step
    last = np.ceil(np.float64(timestamps[-1]) / step) * step
    clock = np.arange(start, last + step + 1, step).astype(np.int64)
    ci = (np.searchsorted(timestamps, clock, side="right") - 1).astype(np.int64)
    return clock, ci


class TestTimeBars:
    def test_matches_reference_clock(self):
        ts = pd.Timestamp("2024-03-01 00:00:00.123").value + np.cumsum(
            np.random.default_rng(0).integers(1, 3_000_000_000, 5000))
        ts = ts.astype(np.int64)
        clock, ci = indexers.time_bar_indexer(jnp.asarray(ts), 60.0)
        rclock, rci = _seq_time_bar_reference(ts, 60.0)
        np.testing.assert_array_equal(np.asarray(clock), rclock)
        np.testing.assert_array_equal(np.asarray(ci), rci)

    def test_empty_bars_duplicate_indices(self):
        # one trade, then a 5-minute gap, then more trades -> empty 1min bars
        base = pd.Timestamp("2024-03-01 00:00:30").value
        ts = np.array([base, base + 300_000_000_000, base + 301_000_000_000],
                      dtype=np.int64)
        _, ci = indexers.time_bar_indexer(jnp.asarray(ts), 60.0)
        ci = np.asarray(ci)
        # consecutive duplicates mark empty bars
        assert (np.diff(ci) == 0).sum() >= 3

    def test_unaligned_start_gives_minus_one_anchor(self):
        base = pd.Timestamp("2024-03-01 00:00:30").value  # not on minute boundary
        ts = base + np.arange(100, dtype=np.int64) * 1_000_000_000
        _, ci = indexers.time_bar_indexer(jnp.asarray(ts), 60.0)
        assert int(np.asarray(ci)[0]) == -1


class TestTickBars:
    @pytest.mark.parametrize("thr", [1, 2, 3, 7, 100])
    def test_matches_sequential_counter(self, thr):
        n = 500
        ts = np.arange(n, dtype=np.int64) * 1000
        _, ci = indexers.tick_bar_indexer(jnp.asarray(ts), thr)
        ci = np.asarray(ci)
        # sequential emulation of logic.py:54-84
        expected = [0]
        cum = 1
        for i in range(1, n):
            cum += 1
            if cum >= thr:
                expected.append(i)
                cum = 0
        np.testing.assert_array_equal(ci, np.array(expected))


class TestVolumeBars:
    def test_reset_semantics(self):
        ts = np.arange(10, dtype=np.int64)
        vols = np.array([5, 1, 1, 9, 1, 1, 1, 20, 1, 1], dtype=np.float64)
        # sequential: cum=5; i1:6; i2:7>=7 -> b2 reset; i3:9>=7 -> b3 reset;
        # i4:1; i5:2; i6:3; i7:23>=7 -> b7 reset; i8:1; i9:2
        _, ci = indexers.volume_bar_indexer(jnp.asarray(ts), jnp.asarray(vols), 7.0)
        np.testing.assert_array_equal(np.asarray(ci), [0, 2, 3, 7])

    def test_no_carry(self):
        ts = np.arange(4, dtype=np.int64)
        vols = np.array([100.0, 1.0, 1.0, 1.0])
        # huge first trade counts only toward the first bar (no carry)
        _, ci = indexers.volume_bar_indexer(jnp.asarray(ts), jnp.asarray(vols), 10.0)
        np.testing.assert_array_equal(np.asarray(ci), [0, 1])


class TestDollarBars:
    def test_carry_semantics(self):
        ts = np.arange(6, dtype=np.int64)
        px = np.ones(6)
        vols = np.array([35.0, 1, 1, 1, 1, 1])
        # cum=35; i1:36>=10 -> b1 cum26; i2:27 -> b2 cum17; i3:18 -> b3 cum8;
        # i4:9; i5:10 -> b5
        _, ci = indexers.dollar_bar_indexer(
            jnp.asarray(ts), jnp.asarray(px), jnp.asarray(vols), 10.0)
        np.testing.assert_array_equal(np.asarray(ci), [0, 1, 2, 3, 5])

    def test_vs_sequential_random(self):
        r = np.random.default_rng(3)
        n = 2000
        ts = np.arange(n, dtype=np.int64)
        px = 100 + r.normal(0, 1, n).cumsum() * 0.01
        vols = r.lognormal(0, 1, n)
        thr = 500.0
        _, ci = indexers.dollar_bar_indexer(
            jnp.asarray(ts), jnp.asarray(px), jnp.asarray(vols), thr)
        # sequential emulation of logic.py:118-149
        expected = [0]
        cum = px[0] * vols[0]
        for i in range(1, n):
            cum += px[i] * vols[i]
            if cum >= thr:
                expected.append(i)
                cum -= thr
        np.testing.assert_array_equal(np.asarray(ci), np.array(expected))


class TestCusumBars:
    @staticmethod
    def _sequential(ts, px, sigma, floor, mult):
        """Sequential emulation of logic.py:152-221."""
        n = len(px)
        sigma = sigma.copy()
        first = 0
        for i in range(n):
            if not np.isnan(sigma[i]):
                first = i
                break
        for i in range(first, n):
            if np.isnan(sigma[i]):
                sigma[i] = sigma[i - 1]
        out = [first]
        s_pos = s_neg = 0.0
        i = first + 1
        while i < n:
            ret = np.log(px[i] / px[i - 1])
            s_pos = max(0.0, s_pos + ret)
            s_neg = min(0.0, s_neg + ret)
            if i + 1 < n and ts[i] == ts[i + 1]:
                i += 1
                continue
            lam = max(mult * sigma[i], floor)
            if s_pos >= lam:
                out.append(i)
                s_pos = 0.0
            elif s_neg <= -lam:
                out.append(i)
                s_neg = 0.0
            i += 1
        return np.array(out), sigma

    def test_vs_sequential(self, trades_small):
        ts, px, _, _ = trades_small
        n = len(px)
        sigma = np.full(n, 5e-4)
        sigma[:50] = np.nan  # leading NaNs: start shifts, then forward-fill
        sigma[200:220] = np.nan
        exp_idx, exp_sigma = self._sequential(ts, px, sigma.copy(), 1e-4, 2.0)
        _, ci, filled = indexers.cusum_bar_indexer(
            jnp.asarray(ts), jnp.asarray(px), jnp.asarray(sigma), 1e-4, 2.0)
        np.testing.assert_array_equal(np.asarray(ci), exp_idx)
        np.testing.assert_allclose(np.asarray(filled)[50:], exp_sigma[50:], rtol=0)

    def test_same_timestamp_block_rule(self):
        # large return inside a same-ts block must not close a bar until
        # the block ends
        ts = np.array([0, 1, 1, 1, 2, 3], dtype=np.int64)
        px = np.array([100.0, 100.0, 110.0, 110.0, 110.0, 110.0])
        sigma = np.full(6, 1e-3)
        exp_idx, _ = self._sequential(ts, px, sigma.copy(), 1e-4, 2.0)
        _, ci, _ = indexers.cusum_bar_indexer(
            jnp.asarray(ts), jnp.asarray(px), jnp.asarray(sigma), 1e-4, 2.0)
        np.testing.assert_array_equal(np.asarray(ci), exp_idx)

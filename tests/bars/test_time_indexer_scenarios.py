"""Deep scenario matrix for the time-bar indexer.

Mirrors the reference's tests/bars/test_time_bar_indexer.py coverage:
precise boundary calculation, empty bars, single trade, interval sweeps,
fractional-second intervals, exact-boundary membership, microsecond
precision, identical timestamps, monotone properties and consistency —
all checked against an oracle replicating the reference's f64 bar-clock
arithmetic (/root/reference/finmlkit/bar/logic.py:12-51).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from finmlkit_tpu.bar.indexers import time_bar_indexer


def _oracle(ts, interval_seconds):
    """f64-clock reference: clock values and right-searchsorted-1 ci."""
    step = float(interval_seconds) * 1e9
    start = np.floor(ts[0] / step) * step
    last = np.ceil(ts[-1] / step) * step
    stop = last + step + 1.0
    n_clock = int(np.ceil((stop - start) / step))
    clock = (start + np.arange(n_clock, dtype=np.float64) * step).astype(np.int64)
    ci = np.searchsorted(ts, clock, side="right").astype(np.int64) - 1
    return clock, ci


def _run(ts, interval):
    clock, ci = time_bar_indexer(jnp.asarray(ts), interval,
                                 ts_first=int(ts[0]), ts_last_i=int(ts[-1]))
    return np.asarray(clock), np.asarray(ci)


SEC = 1_000_000_000


class TestBoundaryMembership:
    def test_trade_exactly_on_boundary_closes_that_bar(self):
        # ts == clock[k] -> counted in the bar closing at clock[k]
        ts = np.array([1 * SEC, 60 * SEC, 61 * SEC], dtype=np.int64)
        clock, ci = _run(ts, 60.0)
        eclock, eci = _oracle(ts, 60.0)
        np.testing.assert_array_equal(clock, eclock)
        np.testing.assert_array_equal(ci, eci)
        # the trade at exactly 60s closes with the first bar
        k = np.where(clock == 60 * SEC)[0][0]
        assert ci[k] == 1

    def test_one_ns_after_boundary_rolls_over(self):
        ts = np.array([1 * SEC, 60 * SEC + 1], dtype=np.int64)
        clock, ci = _run(ts, 60.0)
        k = np.where(clock == 60 * SEC)[0][0]
        assert ci[k] == 0          # only the first trade
        assert ci[k + 1] == 1      # rollover trade in the next bar

    def test_one_ns_before_boundary_stays(self):
        ts = np.array([1 * SEC, 60 * SEC - 1], dtype=np.int64)
        clock, ci = _run(ts, 60.0)
        k = np.where(clock == 60 * SEC)[0][0]
        assert ci[k] == 1


class TestIntervalSweep:
    @pytest.mark.parametrize("interval", [1.0, 5.0, 30.0, 60.0, 300.0, 3600.0])
    def test_matches_oracle(self, interval):
        r = np.random.default_rng(int(interval))
        ts = 1_700_000_000 * SEC + np.cumsum(
            (r.exponential(2.0, 2000) * 1e9).astype(np.int64))
        clock, ci = _run(ts, interval)
        eclock, eci = _oracle(ts, interval)
        np.testing.assert_array_equal(clock, eclock)
        np.testing.assert_array_equal(ci, eci)

    @pytest.mark.parametrize("interval", [0.5, 0.25, 1.5])
    def test_subsecond_intervals(self, interval):
        r = np.random.default_rng(3)
        ts = 1_700_000_000 * SEC + np.cumsum(
            (r.exponential(0.2, 1000) * 1e9).astype(np.int64))
        clock, ci = _run(ts, interval)
        eclock, eci = _oracle(ts, interval)
        np.testing.assert_array_equal(clock, eclock)
        np.testing.assert_array_equal(ci, eci)

    def test_large_interval_single_bar(self):
        ts = np.array([10 * SEC, 500 * SEC, 900 * SEC], dtype=np.int64)
        clock, ci = _run(ts, 86400.0)
        eclock, eci = _oracle(ts, 86400.0)
        np.testing.assert_array_equal(clock, eclock)
        np.testing.assert_array_equal(ci, eci)
        # all trades inside the first day bar
        assert ci[1] == 2


class TestDegenerateInputs:
    def test_single_trade(self):
        ts = np.array([1_700_000_000 * SEC + 37 * SEC], dtype=np.int64)
        clock, ci = _run(ts, 60.0)
        eclock, eci = _oracle(ts, 60.0)
        np.testing.assert_array_equal(clock, eclock)
        np.testing.assert_array_equal(ci, eci)

    def test_identical_timestamps_block(self):
        t0 = 1_700_000_000 * SEC
        ts = np.full(10, t0 + 30 * SEC, dtype=np.int64)
        clock, ci = _run(ts, 60.0)
        eclock, eci = _oracle(ts, 60.0)
        np.testing.assert_array_equal(ci, eci)
        # all ten trades close inside one bar
        assert np.max(np.diff(ci)) == 10

    def test_trade_at_exact_epoch_multiple_start(self):
        # first ts already aligned to the bar grid
        t0 = (1_700_000_000 // 60) * 60 * SEC
        ts = np.array([t0, t0 + 10 * SEC, t0 + 70 * SEC], dtype=np.int64)
        clock, ci = _run(ts, 60.0)
        eclock, eci = _oracle(ts, 60.0)
        np.testing.assert_array_equal(clock, eclock)
        np.testing.assert_array_equal(ci, eci)
        # aligned first trade sits ON clock[0] -> excluded from bar 0
        assert clock[0] == t0 and ci[0] == 0

    def test_microsecond_spacing(self):
        t0 = 1_700_000_000 * SEC
        ts = t0 + np.arange(5000, dtype=np.int64) * 1000  # 1 us apart
        clock, ci = _run(ts, 0.001)  # 1 ms bars
        eclock, eci = _oracle(ts, 0.001)
        np.testing.assert_array_equal(clock, eclock)
        np.testing.assert_array_equal(ci, eci)


class TestStructuralProperties:
    def _random(self, seed=0, n=3000, gap_frac=0.2):
        r = np.random.default_rng(seed)
        dt = (r.exponential(5.0, n) * 1e9).astype(np.int64)
        # inject dead stretches -> empty bars
        dead = r.random(n) < gap_frac / 50
        dt[dead] += int(600e9)
        return 1_700_000_000 * SEC + np.cumsum(dt)

    def test_ci_monotone_nondecreasing(self):
        ts = self._random(1)
        _, ci = _run(ts, 60.0)
        assert np.all(np.diff(ci) >= 0)

    def test_clock_strictly_increasing_uniform_steps(self):
        ts = self._random(2)
        clock, _ = _run(ts, 60.0)
        steps = np.diff(clock)
        assert np.all(steps == steps[0])
        assert steps[0] == 60 * SEC

    def test_empty_bars_produce_duplicate_ci(self):
        ts = self._random(3, gap_frac=1.0)
        _, ci = _run(ts, 60.0)
        assert np.any(np.diff(ci) == 0)  # the dead stretches

    def test_last_clock_beyond_last_trade(self):
        ts = self._random(4)
        clock, ci = _run(ts, 60.0)
        assert clock[-1] >= ts[-1]
        assert ci[-1] == len(ts) - 1

    def test_every_trade_assigned_exactly_once(self):
        ts = self._random(5)
        _, ci = _run(ts, 60.0)
        # total trades covered by consecutive (ci[k], ci[k+1]] spans
        assert int(ci[-1] - ci[0]) + int(ci[0] == 0) <= len(ts)
        counts = np.diff(ci)
        assert counts.sum() == len(ts) - 1 - ci[0]

    def test_consistency_repeated_calls(self):
        ts = self._random(6)
        c1, i1 = _run(ts, 60.0)
        c2, i2 = _run(ts, 60.0)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(i1, i2)

    def test_full_oracle_parity_with_empty_bars(self):
        ts = self._random(7, gap_frac=2.0)
        clock, ci = _run(ts, 60.0)
        eclock, eci = _oracle(ts, 60.0)
        np.testing.assert_array_equal(clock, eclock)
        np.testing.assert_array_equal(ci, eci)

"""Triple-barrier scenario matrix mirroring the reference test suite's
coverage (/root/reference/tests/labels/test_triple_barrier.py): barrier
configurations, trends, min-close-time interplay, return/ratio math,
dtypes/shapes, and a large-dataset oracle comparison."""
import numpy as np
import pytest

from finmlkit_tpu.label.tbm import triple_barrier


def _np(res):
    return tuple(np.asarray(x) for x in res)


def _mk(close, dt_sec=1.0):
    ts = (np.arange(len(close)) * dt_sec * 1e9).astype(np.int64)
    return ts, np.asarray(close, np.float64)


class TestValidationMatrix:
    ts, close = _mk(np.linspace(100, 110, 10))
    ev = np.array([1, 3, 5], dtype=np.int64)
    tg = np.array([0.01, 0.02, 0.03])

    def test_zero_vertical(self):
        with pytest.raises(ValueError, match="vertical barrier must be greater than zero"):
            triple_barrier(self.ts, self.close, self.ev, self.tg, (1.0, 1.0), 0.0)

    def test_negative_vertical(self):
        with pytest.raises(ValueError, match="vertical barrier must be greater than zero"):
            triple_barrier(self.ts, self.close, self.ev, self.tg, (1.0, 1.0), -1.0)

    def test_negative_min_ret(self):
        with pytest.raises(ValueError, match="minimum return must be non-negative"):
            triple_barrier(self.ts, self.close, self.ev, self.tg, (1.0, 1.0),
                           1.0, min_ret=-0.1)

    def test_ts_close_mismatch(self):
        with pytest.raises(ValueError, match="lengths of timestamps and close must match"):
            triple_barrier(self.ts[:-1], self.close, self.ev, self.tg, (1.0, 1.0), 1.0)

    def test_events_targets_mismatch(self):
        with pytest.raises(ValueError, match="lengths of event_idxs and targets must match"):
            triple_barrier(self.ts, self.close, self.ev, self.tg[:-1], (1.0, 1.0), 1.0)

    def test_empty_events(self):
        with pytest.raises(ValueError, match="event_idxs array must not be empty"):
            triple_barrier(self.ts, self.close, np.array([], np.int64),
                           np.array([]), (1.0, 1.0), 1.0)

    def test_side_length_mismatch(self):
        with pytest.raises(ValueError, match="length of event_idxs must match the length of side"):
            triple_barrier(self.ts, self.close, self.ev, self.tg, (1.0, 1.0),
                           1.0, side=np.array([1, -1], np.int8))


class TestBoundaryIndices:
    def test_event_at_first_index(self):
        ts, close = _mk([100, 101, 102, 103, 104])
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.02]),
            (1.0, 1.0), 5.0))
        assert len(labels) == 1 and touch[0] >= 0

    def test_event_at_last_valid_index(self):
        ts, close = _mk([100, 101, 102, 103, 104])
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([3], np.int64), np.array([0.02]),
            (1.0, 1.0), 5.0))
        assert touch[0] >= 3

    def test_event_at_end_skipped(self):
        """Vertical barrier cannot fit -> event skipped (label 0, NaN)."""
        ts, close = _mk([100, 101, 102, 103, 104])
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([4], np.int64), np.array([0.02]),
            (1.0, 1.0), 5.0))
        assert labels[0] == 0
        assert np.isnan(rets[0]) and np.isnan(rbr[0])


class TestTrends:
    def test_uptrend_hits_upper(self):
        ts, close = _mk(100 * np.exp(np.arange(10) * 0.01))
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.025]),
            (1.0, 1.0), 20.0))
        assert labels[0] == 1
        assert rets[0] >= 0.025
        assert rbr[0] == 1.0  # horizontal touch

    def test_downtrend_hits_lower(self):
        ts, close = _mk(100 * np.exp(-np.arange(10) * 0.01))
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.025]),
            (1.0, 1.0), 20.0))
        assert labels[0] == -1
        assert rets[0] <= -0.025

    def test_volatile_flat_times_out(self):
        close = [100, 100.5, 99.6, 100.4, 99.7, 100.2, 99.8, 100.1, 99.9, 100]
        ts, close = _mk(close)
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.1]),
            (1.0, 1.0), 5.0))
        vert = np.searchsorted(ts, ts[0] + 5e9, side="right") - 1
        assert touch[0] == vert
        assert rbr[0] < 1.0 or np.isnan(rbr[0])


class TestBarrierConfigurations:
    def test_asymmetric_multipliers(self):
        # tight upper (0.5x), loose lower (3x): mild uptick closes up
        ts, close = _mk([100, 100.8, 101.6, 102.4, 103.2, 104.0])
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.02]),
            (3.0, 0.5), 10.0))
        assert labels[0] == 1
        assert rets[0] >= 0.01  # 0.5 * 0.02

    def test_infinite_barriers_disable_horizontal(self):
        ts, close = _mk([100, 150, 200, 250, 300, 350, 400, 450, 500, 550])
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.1]),
            (np.inf, np.inf), 5.0))
        vert = np.searchsorted(ts, ts[0] + 5e9, side="right") - 1
        assert touch[0] == vert
        assert np.isnan(rbr[0])  # disabled barriers -> NaN weight

    def test_zero_target_hits_immediately(self):
        ts, close = _mk([100, 105, 110, 115, 120])
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.0]),
            (1.0, 1.0), 3.0))
        assert labels[0] == 1
        assert touch[0] == 1  # first evaluated trade: ret >= 0 == upper
        assert rbr[0] == 1.0

    def test_very_small_and_large_targets(self):
        ts, close = _mk(100 * np.exp(np.arange(20) * 0.001))
        labels_s, touch_s, *_ = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([1e-5]),
            (1.0, 1.0), 30.0))
        assert labels_s[0] == 1 and touch_s[0] == 1
        labels_l, touch_l, rets_l, rbr_l = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([10.0]),
            (1.0, 1.0), 5.0))
        vert = np.searchsorted(ts, ts[0] + 5e9, side="right") - 1
        assert touch_l[0] == vert
        assert rbr_l[0] < 0.01


class TestMinCloseTime:
    def test_blocks_early_closes(self):
        ts = np.array([0, int(0.5e9), int(1e9), int(2e9), int(3e9)], np.int64)
        close = np.array([100, 150, 200, 250, 300], np.float64)
        ev, tg = np.array([0], np.int64), np.array([0.01])
        labels, touch, *_ = _np(triple_barrier(
            ts, close, ev, tg, (1.0, 1.0), 5.0, min_close_time_sec=1.5))
        assert ts[touch[0]] - ts[0] >= 1.5e9
        _, touch0, *_ = _np(triple_barrier(
            ts, close, ev, tg, (1.0, 1.0), 5.0, min_close_time_sec=0.0))
        assert touch0[0] <= touch[0]

    def test_longer_than_vertical_closes_at_vertical(self):
        ts, close = _mk([100, 110, 120, 130, 140])
        labels, touch, *_ = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.05]),
            (1.0, 1.0), 2.0, min_close_time_sec=5.0))
        vert = np.searchsorted(ts, ts[0] + 2e9, side="right") - 1
        assert touch[0] == vert


class TestSidesAndMeta:
    def test_short_side_flips_returns(self):
        ts, close = _mk(100 * np.exp(-np.arange(10) * 0.01))  # falling
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.02]),
            (1.0, 1.0), 20.0, side=np.array([-1], np.int8), min_ret=0.0))
        # short side on a downtrend: side-multiplied return is positive
        assert rets[0] > 0
        assert labels[0] == 1  # meta: ret >= min_ret

    def test_mixed_sides_vectorized(self):
        ts, close = _mk(100 * np.exp(np.arange(20) * 0.005))
        ev = np.array([0, 1, 2], np.int64)
        tg = np.full(3, 0.02)
        side = np.array([1, -1, 1], np.int8)
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, ev, tg, (1.0, 1.0), 30.0, side=side, min_ret=0.01))
        assert labels[0] == 1 and labels[2] == 1  # long rides uptrend
        assert labels[1] == 0  # short side bleeds on an uptrend

    def test_meta_min_ret_gate(self):
        ts, close = _mk([100, 100.3, 100.6, 100.9, 101.2, 101.5])
        ev, tg = np.array([0], np.int64), np.array([0.004])
        side = np.array([1], np.int8)
        hi = _np(triple_barrier(ts, close, ev, tg, (1.0, 1.0), 10.0,
                                side=side, min_ret=0.05))[0]
        lo = _np(triple_barrier(ts, close, ev, tg, (1.0, 1.0), 10.0,
                                side=side, min_ret=0.0))[0]
        assert hi[0] == 0 and lo[0] == 1


class TestReturnMath:
    def test_log_return_value(self):
        ts, close = _mk([100.0, 100.0, 121.0, 121.0])
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.05]),
            (1.0, 1.0), 10.0))
        assert rets[0] == pytest.approx(np.log(121.0 / 100.0), rel=1e-12)

    def test_rbr_partial_progress(self):
        # path reaches 60% of the upper barrier, then times out
        ts, close = _mk([100, 100 * np.exp(0.006), 100 * np.exp(0.003),
                         100 * np.exp(0.001), 100.0, 100.0])
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.01]),
            (1.0, 1.0), 5.0))
        vert = np.searchsorted(ts, ts[0] + 5e9, side="right") - 1
        assert touch[0] == vert
        # max_urbr = 0.006/0.01 = 0.6; ret at vertical = 0 -> lower branch
        # is taken only for ret<0; ret==0 -> upper branch with max_urbr
        assert 0.0 <= rbr[0] <= 1.0

    def test_rbr_capped_at_one(self):
        ts, close = _mk(100 * np.exp(np.arange(8) * 0.004))
        labels, touch, rets, rbr = _np(triple_barrier(
            ts, close, np.array([0], np.int64), np.array([0.01]),
            (1.0, 1.0), 30.0))
        assert rbr[0] == 1.0  # horizontal touch weight is exactly 1


class TestShapesAndTypes:
    def test_dtypes(self):
        ts, close = _mk(np.linspace(100, 105, 30))
        ev = np.array([0, 5, 10], np.int64)
        tg = np.full(3, 0.01)
        labels, touch, rets, rbr = triple_barrier(
            ts, close, ev, tg, (1.0, 1.0), 10.0)
        assert np.asarray(labels).dtype == np.int8
        assert np.asarray(touch).dtype == np.int64
        assert np.asarray(rets).dtype == np.float64
        assert np.asarray(rbr).dtype == np.float64
        assert all(np.asarray(x).shape == (3,)
                   for x in (labels, touch, rets, rbr))


def _sequential_oracle(ts, close, ev, tg, hb, vb_sec, mct_sec=0.0,
                       side=None, min_ret=0.0):
    """Plain-python reimplementation of the reference walk (oracle)."""
    log_close = np.log(close)
    lower_m, upper_m = hb
    is_meta = side is not None
    n_ev = len(ev)
    labels = np.zeros(n_ev, np.int8)
    touch = np.zeros(n_ev, np.int64)
    rets = np.full(n_ev, np.nan)
    rbrs = np.full(n_ev, np.nan)
    for i in range(n_ev):
        t0_idx = ev[i]
        t0 = ts[t0_idx]
        t1_idx = np.searchsorted(ts, t0 + vb_sec * 1e9, side="right") - 1
        if t1_idx <= t0_idx:
            touch[i] = t0_idx
            continue
        upper = tg[i] * upper_m
        lower = -tg[i] * lower_m
        uv = np.isfinite(upper) and upper != 0.0
        lv = np.isfinite(lower) and lower != 0.0
        sm = side[i] if is_meta else 1.0
        base = log_close[t0_idx]
        ti = t1_idx
        mu = ml = 0.0
        ret = 0.0
        for j in range(t0_idx + 1, t1_idx + 1):
            if ts[j] - t0 < mct_sec * 1e9:
                continue
            ret = (log_close[j] - base) * sm
            if ret > 0 and uv:
                mu = max(mu, ret / upper)
            elif ret < 0 and lv:
                ml = max(ml, ret / lower)
            if ret >= upper or ret <= lower:
                ti = j
                break
        touch[i] = ti
        rets[i] = ret
        if is_meta:
            labels[i] = 1 if ret >= min_ret else 0
        else:
            s = np.sign(ret)
            labels[i] = s if s != 0 else 1
        if ti == t1_idx:
            if ret > 0:
                r = mu / (1 + ml)
                r = r if uv else np.nan
            else:
                r = ml / (1 + mu)
                r = r if lv else np.nan
            rbrs[i] = min(r, 1.0)
        else:
            rbrs[i] = 1.0
    return labels, touch, rets, rbrs


def test_large_dataset_vs_sequential_oracle():
    r = np.random.default_rng(33)
    n = 20000
    ts = np.cumsum(r.exponential(0.2, n) * 1e9).astype(np.int64)
    close = 100 * np.exp(np.cumsum(r.normal(0, 5e-4, n)))
    ev = np.sort(r.choice(np.arange(0, n - 2000), 150, replace=False)).astype(np.int64)
    tg = r.uniform(5e-4, 5e-3, len(ev))
    for kwargs in ({}, {"min_close_time_sec": 2.0},
                   {"side": r.choice(np.array([-1, 1], np.int8), len(ev)),
                    "min_ret": 1e-3}):
        got = _np(triple_barrier(ts, close, ev, tg, (1.0, 1.5), 60.0,
                                 **kwargs))
        want = _sequential_oracle(ts, close, ev, tg, (1.0, 1.5), 60.0,
                                  kwargs.get("min_close_time_sec", 0.0),
                                  kwargs.get("side"),
                                  kwargs.get("min_ret", 0.0))
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
        np.testing.assert_allclose(got[2], want[2], rtol=1e-12, atol=0)
        np.testing.assert_allclose(got[3], want[3], rtol=1e-12, atol=0)

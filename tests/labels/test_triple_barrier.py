"""Triple-barrier tests: validation errors, hand-worked barrier touches,
meta-labeling, min-close-time — mirroring the scenario coverage of the
reference suite (tests/labels/test_triple_barrier.py)."""
import numpy as np
import pytest

from finmlkit_tpu.label import triple_barrier


def make_series(prices, dt_sec=1.0):
    ts = (np.arange(len(prices)) * dt_sec * 1e9).astype(np.int64) + 1_700_000_000_000_000_000
    return ts, np.asarray(prices, dtype=np.float64)


class TestValidation:
    def test_bad_vertical(self):
        ts, px = make_series([1, 2, 3])
        with pytest.raises(ValueError, match="vertical barrier"):
            triple_barrier(ts, px, np.array([0]), np.array([0.1]), (1.0, 1.0), 0.0)

    def test_negative_min_ret(self):
        ts, px = make_series([1, 2, 3])
        with pytest.raises(ValueError, match="minimum return"):
            triple_barrier(ts, px, np.array([0]), np.array([0.1]), (1.0, 1.0),
                           10.0, min_ret=-0.1)

    def test_len_mismatch(self):
        ts, px = make_series([1, 2, 3])
        with pytest.raises(ValueError, match="event_idxs and targets"):
            triple_barrier(ts, px, np.array([0, 1]), np.array([0.1]), (1.0, 1.0), 10.0)

    def test_empty_events(self):
        ts, px = make_series([1, 2, 3])
        with pytest.raises(ValueError, match="not be empty"):
            triple_barrier(ts, px, np.array([], dtype=np.int64),
                           np.array([]), (1.0, 1.0), 10.0)


class TestBarrierTouches:
    def test_upper_touch(self):
        # climb of +1% per step; target 2% with mult 1 -> touch at step 3
        px = 100.0 * np.exp(0.01 * np.arange(10))
        ts, px = make_series(px)
        labels, touch, rets, rbr = triple_barrier(
            ts, px, np.array([0]), np.array([0.0195]), (1.0, 1.0), 100.0,
            min_close_time_sec=0.0)
        assert labels[0] == 1
        # ret at j: ~0.01*j; first j with ret >= 0.0195 is j=2
        assert touch[0] == 2
        np.testing.assert_allclose(rets[0], 0.02, atol=1e-10)
        assert rbr[0] == 1.0

    def test_lower_touch(self):
        px = 100.0 * np.exp(-0.01 * np.arange(10))
        ts, px = make_series(px)
        labels, touch, rets, rbr = triple_barrier(
            ts, px, np.array([0]), np.array([0.0195]), (1.0, 1.0), 100.0,
            min_close_time_sec=0.0)
        assert labels[0] == -1
        assert touch[0] == 2
        np.testing.assert_allclose(rets[0], -0.02, atol=1e-10)
        assert rbr[0] == 1.0

    def test_vertical_touch(self):
        # flat path, barriers unreachable -> vertical at t0+5s
        px = np.full(10, 100.0)
        ts, px = make_series(px)
        labels, touch, rets, rbr = triple_barrier(
            ts, px, np.array([0]), np.array([0.5]), (1.0, 1.0), 5.0,
            min_close_time_sec=0.0)
        assert touch[0] == 5
        assert rets[0] == 0.0
        assert labels[0] == 1  # sign(0) -> +1 convention
        # ratios: no progress toward either barrier -> 0/(1+0)=0
        np.testing.assert_allclose(rbr[0], 0.0)

    def test_vertical_touch_rbr(self):
        # drift up close to the barrier but not touching -> rbr near ratio
        path = [100.0, 100.5, 101.0, 100.8, 100.9]
        ts, px = make_series(path)
        tgt = 0.02  # upper barrier = 0.02 log ret -> ~102.02
        labels, touch, rets, rbr = triple_barrier(
            ts, px, np.array([0]), np.array([tgt]), (1.0, 1.0), 4.0,
            min_close_time_sec=0.0)
        assert touch[0] == 4
        max_ur = np.log(101.0 / 100.0) / tgt
        np.testing.assert_allclose(rbr[0], max_ur / 1.0, rtol=1e-12)
        assert labels[0] == 1

    def test_disabled_barriers_nan_rbr(self):
        px = np.full(10, 100.0) * np.exp(0.001 * np.arange(10))
        ts, px = make_series(px)
        labels, touch, rets, rbr = triple_barrier(
            ts, px, np.array([0]), np.array([np.inf]), (1.0, 1.0), 5.0,
            min_close_time_sec=0.0)
        assert touch[0] == 5
        assert np.isnan(rbr[0])  # upper barrier inf -> invalid -> NaN

    def test_min_close_time_blocks_early_touch(self):
        # touch would be at 2s but min_close_time is 3s
        px = 100.0 * np.exp(0.01 * np.arange(10))
        ts, px = make_series(px)
        labels, touch, rets, _ = triple_barrier(
            ts, px, np.array([0]), np.array([0.02]), (1.0, 1.0), 100.0,
            min_close_time_sec=3.0)
        assert touch[0] == 3  # first closeable trade also crosses
        np.testing.assert_allclose(rets[0], 0.03, atol=1e-12)

    def test_skipped_event(self):
        # vertical barrier window has no trades after t0 -> skip
        px = np.full(5, 100.0)
        ts, px = make_series(px)
        labels, touch, rets, rbr = triple_barrier(
            ts, px, np.array([4]), np.array([0.1]), (1.0, 1.0), 0.5,
            min_close_time_sec=0.0)
        assert labels[0] == 0
        assert np.isnan(rets[0])
        assert np.isnan(rbr[0])


class TestMetaLabeling:
    def test_meta_aligned_side(self):
        px = 100.0 * np.exp(0.01 * np.arange(10))
        ts, px = make_series(px)
        labels, _, rets, _ = triple_barrier(
            ts, px, np.array([0, 0]), np.array([0.0195, 0.0195]), (1.0, 1.0),
            100.0, min_close_time_sec=0.0,
            side=np.array([1, -1], dtype=np.int8), min_ret=0.005)
        # long side profits (+0.02 >= min_ret) -> 1; short side loses -> 0
        assert labels[0] == 1
        assert labels[1] == 0
        np.testing.assert_allclose(rets[1], -0.02, atol=1e-10)

    def test_meta_min_ret_threshold(self):
        px = np.concatenate([[100.0], np.full(9, 100.2)])
        ts, px = make_series(px)
        labels, _, rets, _ = triple_barrier(
            ts, px, np.array([0]), np.array([0.5]), (1.0, 1.0), 5.0,
            min_close_time_sec=0.0, side=np.array([1], dtype=np.int8),
            min_ret=0.01)
        # ret ~ 0.002 < min_ret -> 0
        assert labels[0] == 0


class TestMultiEvent:
    def test_many_events_vs_sequential(self, trades_small):
        ts, px, _, _ = trades_small
        n = len(px)
        events = np.arange(10, n - 500, 97, dtype=np.int64)
        targets = np.full(len(events), 0.001)
        labels, touch, rets, rbr = triple_barrier(
            ts, px, events, targets, (1.0, 2.0), 30.0,
            min_close_time_sec=0.5)
        # sequential emulation of tbm.py:77-157
        lc = np.log(px)
        for k in [0, 3, 7, len(events) - 1]:
            t0i = events[k]
            tgt = targets[k]
            ub, lb = tgt * 2.0, -tgt * 1.0
            t0 = ts[t0i]
            t1i = np.searchsorted(ts, t0 + 30.0 * 1e9, side="right") - 1
            exp_touch = t1i
            mu = ml = 0.0
            ret = 0.0
            for j in range(t0i + 1, t1i + 1):
                if ts[j] - t0 < 0.5e9:
                    continue
                ret = lc[j] - lc[t0i]
                if ret > 0:
                    mu = max(mu, ret / ub)
                elif ret < 0:
                    ml = max(ml, ret / lb)
                if ret >= ub or ret <= lb:
                    exp_touch = j
                    break
            assert touch[k] == exp_touch, k
            np.testing.assert_allclose(rets[k], ret, atol=1e-12)
            if exp_touch == t1i:
                exp = (mu / (1 + ml)) if ret > 0 else (ml / (1 + mu))
                np.testing.assert_allclose(rbr[k], min(exp, 1.0), atol=1e-12)
            else:
                assert rbr[k] == 1.0

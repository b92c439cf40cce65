"""AFML sample-weight tests vs hand-computed / sequential expectations."""
import numpy as np
import pytest

from finmlkit_tpu.label import (
    average_uniqueness,
    return_attribution,
    time_decay,
    class_balance_weights,
)


class TestAverageUniqueness:
    def test_hand_computed(self):
        ts = np.arange(10, dtype=np.int64)
        ev = np.array([0, 2, 4])
        tch = np.array([4, 6, 8])
        w, conc = average_uniqueness(ts, ev, tch)
        # concurrency: idx0:1,1:1,2:2,3:2,4:3,5:2,6:2,7:1,8:1,9:0
        np.testing.assert_array_equal(
            np.asarray(conc), [1, 1, 2, 2, 3, 2, 2, 1, 1, 0])
        exp0 = np.mean(1.0 / np.array([1, 1, 2, 2, 3]))
        exp1 = np.mean(1.0 / np.array([2, 2, 3, 2, 2]))
        exp2 = np.mean(1.0 / np.array([3, 2, 2, 1, 1]))
        np.testing.assert_allclose(np.asarray(w), [exp0, exp1, exp2], rtol=1e-12)

    def test_non_overlapping_unit_weight(self):
        ts = np.arange(10, dtype=np.int64)
        w, _ = average_uniqueness(ts, np.array([0, 5]), np.array([2, 7]))
        np.testing.assert_allclose(np.asarray(w), [1.0, 1.0])

    def test_len_mismatch(self):
        with pytest.raises(ValueError):
            average_uniqueness(np.arange(5), np.array([0]), np.array([1, 2]))


class TestReturnAttribution:
    def test_hand_computed(self):
        close = np.array([100.0, 101.0, 102.0, 101.0, 103.0, 104.0])
        ev = np.array([0, 2])
        tch = np.array([3, 5])
        _, conc = average_uniqueness(np.arange(6, dtype=np.int64), ev, tch)
        w = return_attribution(ev, tch, close, conc, normalize=False)
        lr = np.concatenate([[np.nan], np.diff(np.log(close))])
        conc = np.asarray(conc)
        exp0 = abs(sum(lr[j] / conc[j] for j in range(0, 4)
                       if conc[j] > 0 and not np.isnan(lr[j])))
        exp1 = abs(sum(lr[j] / conc[j] for j in range(2, 6)
                       if conc[j] > 0 and not np.isnan(lr[j])))
        np.testing.assert_allclose(np.asarray(w), [exp0, exp1], rtol=1e-12)

    def test_normalized_sums_to_n(self):
        close = np.linspace(100, 110, 20)
        ev = np.array([0, 5, 10])
        tch = np.array([8, 12, 18])
        _, conc = average_uniqueness(np.arange(20, dtype=np.int64), ev, tch)
        w = return_attribution(ev, tch, close, conc, normalize=True)
        np.testing.assert_allclose(float(np.sum(np.asarray(w))), 3.0, rtol=1e-12)


class TestTimeDecay:
    def test_no_decay(self):
        u = np.array([0.5, 0.5, 0.5])
        w = time_decay(u, 1.0)
        np.testing.assert_allclose(np.asarray(w), [1.0, 1.0, 1.0])

    def test_linear_decay(self):
        u = np.array([1.0, 1.0, 1.0, 1.0])
        w = np.asarray(time_decay(u, 0.5))
        # cumsum = 1..4, slope = 0.5/4, const = 0.5
        np.testing.assert_allclose(w, 0.5 + 0.125 * np.arange(1, 5))
        assert w[-1] == 1.0

    def test_negative_truncation(self):
        u = np.ones(10)
        w = np.asarray(time_decay(u, -0.5))
        assert (w[:4] == 0.0).sum() >= 4  # oldest half erased
        np.testing.assert_allclose(w[-1], 1.0)

    def test_invalid_last_weight(self):
        with pytest.raises(ValueError):
            time_decay(np.ones(3), 1.5)


class TestClassBalance:
    def test_balanced(self):
        labels = np.array([1, 1, -1, -1], dtype=np.int8)
        base = np.ones(4)
        uniq, cw, sums, final = class_balance_weights(labels, base)
        np.testing.assert_array_equal(uniq, [-1, 1])
        np.testing.assert_allclose(np.asarray(cw), [1.0, 1.0])
        np.testing.assert_allclose(np.asarray(final), base)

    def test_imbalanced(self):
        labels = np.array([1, 1, 1, -1], dtype=np.int8)
        base = np.ones(4)
        uniq, cw, sums, final = class_balance_weights(labels, base)
        # total=4, n_classes=2: w(-1)=4/(2*1)=2, w(1)=4/(2*3)=2/3
        np.testing.assert_allclose(np.asarray(cw), [2.0, 2.0 / 3.0])
        np.testing.assert_allclose(np.asarray(final), [2 / 3, 2 / 3, 2 / 3, 2.0])

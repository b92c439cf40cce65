"""Deep scenario matrix for AFML sample weights.

Mirrors the reference's scenario coverage in
tests/labels/test_label_concurrency.py, test_return_attribution.py,
test_time_decay.py and test_class_balace_weights.py (semantics, not
code): overlap patterns, boundary/adjacent events, zero-concurrency
stretches, normalization proportions, decay slopes, truncation, class
imbalance and degenerate classes.
"""
import numpy as np
import pytest

from finmlkit_tpu.label import (
    average_uniqueness,
    return_attribution,
    time_decay,
    class_balance_weights,
)


def _seq_uniqueness(n, ev, tch):
    """Sequential oracle mirroring weights.py:7-49 semantics."""
    conc = np.zeros(n, dtype=np.int16)
    for s, e in zip(ev, tch):
        conc[s:e + 1] += 1
    w = np.array([np.mean(1.0 / conc[s:e + 1]) for s, e in zip(ev, tch)])
    return w, conc


def _seq_return_attr(ev, tch, close, conc, normalize):
    """Sequential oracle mirroring weights.py:52-103 semantics."""
    lr = np.concatenate([[np.nan], np.diff(np.log(close))])
    out = np.zeros(len(ev))
    for i, (s, e) in enumerate(zip(ev, tch)):
        acc = 0.0
        for j in range(s, e + 1):
            if conc[j] > 0 and not np.isnan(lr[j]):
                acc += lr[j] / conc[j]
        out[i] = abs(acc)
    if normalize:
        out *= len(ev) / out.sum()
    return out


class TestUniquenessOverlapPatterns:
    def test_full_overlap_three_events(self):
        # three identical intervals -> concurrency 3 inside, weight 1/3
        ts = np.arange(12, dtype=np.int64)
        ev = np.array([2, 2, 2])
        tch = np.array([7, 7, 7])
        w, conc = average_uniqueness(ts, ev, tch)
        np.testing.assert_array_equal(np.asarray(conc)[2:8], 3)
        np.testing.assert_allclose(np.asarray(w), 1.0 / 3.0, rtol=1e-12)

    def test_adjacent_events_touch_boundary_overlaps(self):
        # touch of event 0 == event index of event 1: the shared index
        # has concurrency 2 (interval is inclusive at both ends)
        ts = np.arange(10, dtype=np.int64)
        ev = np.array([0, 4])
        tch = np.array([4, 8])
        w, conc = average_uniqueness(ts, ev, tch)
        conc = np.asarray(conc)
        assert conc[4] == 2
        np.testing.assert_array_equal(conc[:4], 1)
        np.testing.assert_array_equal(conc[5:9], 1)
        exp = np.mean(1.0 / np.array([1, 1, 1, 1, 2]))
        np.testing.assert_allclose(np.asarray(w), [exp, exp], rtol=1e-12)

    def test_single_timestamp_events(self):
        # zero-length intervals (event == touch) at the same index
        ts = np.arange(6, dtype=np.int64)
        ev = np.array([3, 3])
        tch = np.array([3, 3])
        w, conc = average_uniqueness(ts, ev, tch)
        conc = np.asarray(conc)
        assert conc[3] == 2
        assert conc.sum() == 2
        np.testing.assert_allclose(np.asarray(w), [0.5, 0.5])

    def test_event_at_last_index(self):
        ts = np.arange(5, dtype=np.int64)
        w, conc = average_uniqueness(ts, np.array([4]), np.array([4]))
        assert np.asarray(conc)[4] == 1
        np.testing.assert_allclose(np.asarray(w), [1.0])

    def test_staircase_pattern_vs_oracle(self):
        n = 40
        ev = np.array([0, 3, 6, 9, 12, 30])
        tch = np.array([10, 13, 16, 19, 22, 39])
        w, conc = average_uniqueness(np.arange(n, dtype=np.int64), ev, tch)
        ew, ec = _seq_uniqueness(n, ev, tch)
        np.testing.assert_array_equal(np.asarray(conc), ec)
        np.testing.assert_allclose(np.asarray(w), ew, rtol=1e-12)

    def test_nested_intervals_vs_oracle(self):
        # one long interval fully containing several short ones
        n = 30
        ev = np.array([0, 5, 10, 15])
        tch = np.array([29, 8, 12, 20])
        w, conc = average_uniqueness(np.arange(n, dtype=np.int64), ev, tch)
        ew, ec = _seq_uniqueness(n, ev, tch)
        np.testing.assert_array_equal(np.asarray(conc), ec)
        np.testing.assert_allclose(np.asarray(w), ew, rtol=1e-12)

    def test_weights_bounded_unit_interval(self):
        r = np.random.default_rng(11)
        n = 500
        ev = np.sort(r.choice(n - 50, 40, replace=False)).astype(np.int64)
        tch = ev + r.integers(0, 49, 40)
        w, _ = average_uniqueness(np.arange(n, dtype=np.int64), ev, tch)
        w = np.asarray(w)
        assert np.all(w > 0.0) and np.all(w <= 1.0 + 1e-12)

    def test_concurrency_totals_conserved(self):
        # sum of concurrency == sum of interval lengths (inclusive)
        r = np.random.default_rng(7)
        n = 300
        ev = np.sort(r.choice(n - 30, 25, replace=False)).astype(np.int64)
        tch = ev + r.integers(0, 29, 25)
        _, conc = average_uniqueness(np.arange(n, dtype=np.int64), ev, tch)
        assert int(np.asarray(conc).sum()) == int((tch - ev + 1).sum())

    def test_large_random_vs_oracle(self):
        r = np.random.default_rng(3)
        n = 5000
        ev = np.sort(r.choice(n - 200, 300, replace=False)).astype(np.int64)
        tch = ev + r.integers(0, 199, 300)
        w, conc = average_uniqueness(np.arange(n, dtype=np.int64), ev, tch)
        ew, ec = _seq_uniqueness(n, ev, tch)
        np.testing.assert_array_equal(np.asarray(conc), ec)
        np.testing.assert_allclose(np.asarray(w), ew, rtol=1e-10)

    def test_return_dtypes(self):
        w, conc = average_uniqueness(np.arange(8, dtype=np.int64),
                                     np.array([1]), np.array([5]))
        assert np.asarray(w).dtype == np.float64
        assert np.asarray(conc).dtype == np.int16


class TestReturnAttributionScenarios:
    def _run(self, close, ev, tch, normalize=False):
        n = len(close)
        _, conc = average_uniqueness(np.arange(n, dtype=np.int64), ev, tch)
        w = return_attribution(ev, tch, np.asarray(close, np.float64), conc,
                               normalize=normalize)
        return np.asarray(w), np.asarray(conc)

    def test_identical_prices_zero_attribution(self):
        close = np.full(10, 50.0)
        w, _ = self._run(close, np.array([0, 4]), np.array([3, 8]))
        np.testing.assert_allclose(w, 0.0)

    def test_single_event_gets_full_log_return(self):
        close = np.array([100.0, 101.0, 103.0, 102.0, 104.0])
        w, _ = self._run(close, np.array([0]), np.array([4]))
        # sole event -> concurrency 1 everywhere in window; index 0 ret is
        # NaN and skipped, so attribution = |log(104/100)|
        np.testing.assert_allclose(w, [abs(np.log(104.0 / 100.0))], rtol=1e-12)

    def test_event_not_from_zero_telescopes(self):
        close = np.array([100.0, 99.0, 98.0, 97.0, 99.5, 101.0])
        w, _ = self._run(close, np.array([1]), np.array([5]))
        # window [1,5] with conc 1: sum of log rets 2..5 + ret at idx1
        exp = abs(np.log(101.0 / 100.0))  # telescoping from idx0 ratio
        np.testing.assert_allclose(w, [exp], rtol=1e-12)

    def test_absolute_value_property(self):
        # strictly falling prices still give positive weights
        close = np.linspace(100, 80, 12)
        w, _ = self._run(close, np.array([0, 5]), np.array([4, 10]))
        assert np.all(w > 0.0)

    def test_overlap_splits_attribution(self):
        # two fully overlapping events share every return 50/50
        close = np.array([100.0, 102.0, 104.0, 103.0, 105.0])
        ev = np.array([0, 0])
        tch = np.array([4, 4])
        w, conc = self._run(close, ev, tch)
        np.testing.assert_array_equal(conc, 2)
        exp = abs(np.log(105.0 / 100.0)) / 2.0
        np.testing.assert_allclose(w, [exp, exp], rtol=1e-12)

    def test_concurrency_scaling_three_way(self):
        close = np.exp(np.linspace(0, 0.1, 8)) * 100
        ev = np.array([0, 0, 0])
        tch = np.array([7, 7, 7])
        w, _ = self._run(close, ev, tch)
        exp = abs(np.log(close[7] / close[0])) / 3.0
        np.testing.assert_allclose(w, exp, rtol=1e-12)

    def test_normalization_sums_to_n_events(self):
        r = np.random.default_rng(5)
        close = 100 * np.exp(np.cumsum(r.normal(0, 0.01, 100)))
        ev = np.array([0, 10, 30, 55])
        tch = np.array([20, 35, 60, 90])
        w, _ = self._run(close, ev, tch, normalize=True)
        np.testing.assert_allclose(w.sum(), 4.0, rtol=1e-12)

    def test_normalization_preserves_proportions(self):
        r = np.random.default_rng(9)
        close = 100 * np.exp(np.cumsum(r.normal(0, 0.01, 80)))
        ev = np.array([0, 20, 40])
        tch = np.array([15, 35, 70])
        raw, _ = self._run(close, ev, tch, normalize=False)
        norm, _ = self._run(close, ev, tch, normalize=True)
        np.testing.assert_allclose(norm / norm.sum(), raw / raw.sum(),
                                   rtol=1e-12)

    def test_normalize_zero_weights_raises(self):
        close = np.full(10, 42.0)
        n = len(close)
        _, conc = average_uniqueness(np.arange(n, dtype=np.int64),
                                     np.array([0]), np.array([5]))
        with pytest.raises(ValueError):
            return_attribution(np.array([0]), np.array([5]), close, conc,
                               normalize=True)

    def test_random_vs_sequential_oracle(self):
        r = np.random.default_rng(17)
        n = 2000
        close = 100 * np.exp(np.cumsum(r.normal(0, 0.005, n)))
        ev = np.sort(r.choice(n - 100, 60, replace=False)).astype(np.int64)
        tch = ev + r.integers(1, 99, 60)
        _, conc = average_uniqueness(np.arange(n, dtype=np.int64), ev, tch)
        w = np.asarray(return_attribution(ev, tch, close, conc,
                                          normalize=False))
        exp = _seq_return_attr(ev, tch, close, np.asarray(conc), False)
        np.testing.assert_allclose(w, exp, rtol=1e-9)

    def test_extreme_price_moves(self):
        close = np.array([1.0, 1000.0, 0.5, 800.0, 2.0])
        w, _ = self._run(close, np.array([0, 1]), np.array([3, 4]))
        assert np.all(np.isfinite(w))
        exp = _seq_return_attr(np.array([0, 1]), np.array([3, 4]), close,
                               self._run(close, np.array([0, 1]),
                                         np.array([3, 4]))[1], False)
        np.testing.assert_allclose(w, exp, rtol=1e-10)


class TestTimeDecayScenarios:
    def test_zero_sum_uniqueness_raises(self):
        with pytest.raises(ValueError):
            time_decay(np.zeros(5), 0.5)

    def test_single_element_is_one(self):
        w = np.asarray(time_decay(np.array([0.7]), 0.3))
        np.testing.assert_allclose(w, [1.0], rtol=1e-12)

    def test_newest_always_one(self):
        for lw in (-0.9, -0.5, 0.0, 0.25, 0.75, 1.0):
            u = np.random.default_rng(1).random(20) + 0.01
            w = np.asarray(time_decay(u, lw))
            np.testing.assert_allclose(w[-1], 1.0, rtol=1e-12)

    def test_zero_last_weight_oldest_near_zero(self):
        u = np.ones(10)
        w = np.asarray(time_decay(u, 0.0))
        # oldest weight = const + slope*u[0] = 0 + (1/10)*1
        np.testing.assert_allclose(w[0], 0.1, rtol=1e-12)
        np.testing.assert_allclose(w, np.arange(1, 11) / 10.0, rtol=1e-12)

    def test_monotone_nondecreasing(self):
        u = np.random.default_rng(2).random(50) + 0.01
        for lw in (-0.7, 0.0, 0.4, 1.0):
            w = np.asarray(time_decay(u, lw))
            assert np.all(np.diff(w) >= -1e-15)

    def test_slope_formula_positive(self):
        u = np.array([0.2, 0.4, 0.4, 1.0])
        lw = 0.25
        cum = np.cumsum(u)
        slope = (1 - lw) / cum[-1]
        exp = (1 - slope * cum[-1]) + slope * cum
        np.testing.assert_allclose(np.asarray(time_decay(u, lw)), exp,
                                   rtol=1e-12)

    def test_slope_formula_negative_with_clip(self):
        u = np.ones(8)
        lw = -0.25
        cum = np.cumsum(u)
        slope = 1.0 / ((lw + 1.0) * cum[-1])
        exp = np.maximum((1 - slope * cum[-1]) + slope * cum, 0.0)
        w = np.asarray(time_decay(u, lw))
        np.testing.assert_allclose(w, exp, rtol=1e-12)
        assert (w == 0.0).sum() >= 1  # oldest quarter erased

    def test_negative_near_minus_one_erases_almost_all(self):
        u = np.ones(100)
        w = np.asarray(time_decay(u, -0.99))
        assert (w == 0.0).sum() >= 98
        np.testing.assert_allclose(w[-1], 1.0, rtol=1e-9)

    def test_uniqueness_scale_invariance(self):
        # scaling all uniqueness by a constant leaves weights unchanged
        u = np.random.default_rng(4).random(30) + 0.05
        w1 = np.asarray(time_decay(u, 0.3))
        w2 = np.asarray(time_decay(u * 7.5, 0.3))
        np.testing.assert_allclose(w1, w2, rtol=1e-12)

    def test_tiny_uniqueness_numerically_stable(self):
        u = np.full(20, 1e-12)
        w = np.asarray(time_decay(u, 0.5))
        assert np.all(np.isfinite(w))
        np.testing.assert_allclose(w[-1], 1.0, rtol=1e-9)

    def test_increasing_vs_decreasing_uniqueness_shapes(self):
        inc = np.linspace(0.01, 1.0, 25)
        dec = inc[::-1].copy()
        wi = np.asarray(time_decay(inc, 0.0))
        wd = np.asarray(time_decay(dec, 0.0))
        # decreasing uniqueness front-loads cum mass -> older events keep
        # relatively more weight than under increasing uniqueness
        assert wd[:12].mean() > wi[:12].mean()

    def test_invalid_bounds(self):
        for lw in (-1.0001, 1.0001, 5.0):
            with pytest.raises(ValueError):
                time_decay(np.ones(4), lw)


class TestClassBalanceScenarios:
    def test_custom_base_weights_drive_class_sums(self):
        labels = np.array([1, 1, -1], dtype=np.int8)
        base = np.array([0.5, 1.5, 4.0])
        uniq, cw, sums, final = class_balance_weights(labels, base)
        np.testing.assert_array_equal(uniq, [-1, 1])
        np.testing.assert_allclose(np.asarray(sums), [4.0, 2.0])
        # total 6, 2 classes: w(-1)=6/(2*4), w(1)=6/(2*2)
        np.testing.assert_allclose(np.asarray(cw), [0.75, 1.5])
        np.testing.assert_allclose(np.asarray(final), [0.75, 2.25, 3.0])

    def test_single_class_gets_half_weight_multiplier(self):
        # with one observed class of k classes=1: w = total/(1*total) = 1
        labels = np.ones(5, dtype=np.int8)
        base = np.full(5, 2.0)
        uniq, cw, sums, final = class_balance_weights(labels, base)
        assert len(np.asarray(uniq)) == 1
        np.testing.assert_allclose(np.asarray(cw), [1.0])
        np.testing.assert_allclose(np.asarray(final), base)

    def test_zero_weight_class_gets_zero_multiplier(self):
        labels = np.array([1, 1, -1], dtype=np.int8)
        base = np.array([1.0, 1.0, 0.0])
        uniq, cw, sums, final = class_balance_weights(labels, base)
        cw = np.asarray(cw)
        np.testing.assert_allclose(cw[0], 0.0)  # class -1 sum is 0
        # class 1: total 2 / (2 classes * 2) = 0.5 (zero-mass class still
        # counts toward n_classes, matching the reference formula)
        np.testing.assert_allclose(cw[1], 0.5)
        np.testing.assert_allclose(np.asarray(final), [0.5, 0.5, 0.0])

    def test_all_zero_weights_no_error(self):
        labels = np.array([1, -1], dtype=np.int8)
        uniq, cw, sums, final = class_balance_weights(labels, np.zeros(2))
        np.testing.assert_allclose(np.asarray(final), 0.0)

    def test_three_classes(self):
        labels = np.array([-1, 0, 0, 1, 1, 1], dtype=np.int8)
        base = np.ones(6)
        uniq, cw, sums, final = class_balance_weights(labels, base)
        np.testing.assert_array_equal(np.asarray(uniq), [-1, 0, 1])
        np.testing.assert_allclose(np.asarray(cw),
                                   [6 / 3, 6 / (3 * 2), 6 / (3 * 3)])
        # per-class weighted totals equalize: sum(final | class) == total/n
        f = np.asarray(final)
        for c in (-1, 0, 1):
            np.testing.assert_allclose(f[labels == c].sum(), 2.0, rtol=1e-12)

    def test_weighted_total_preserved(self):
        # sum of final weights == sum of base weights whenever all classes
        # have positive mass (each class total maps to total/n_classes)
        r = np.random.default_rng(8)
        labels = r.choice([-1, 0, 1], 200).astype(np.int8)
        base = r.random(200) + 0.1
        _, _, sums, final = class_balance_weights(labels, base)
        np.testing.assert_allclose(float(np.asarray(final).sum()),
                                   float(base.sum()), rtol=1e-10)

    def test_single_sample(self):
        uniq, cw, sums, final = class_balance_weights(
            np.array([1], dtype=np.int8), np.array([3.0]))
        np.testing.assert_allclose(np.asarray(final), [3.0])

    def test_heavy_imbalance_boosts_minority(self):
        labels = np.array([1] * 99 + [-1], dtype=np.int8)
        base = np.ones(100)
        uniq, cw, sums, final = class_balance_weights(labels, base)
        cw = np.asarray(cw)
        # minority multiplier 100/(2*1)=50, majority 100/(2*99)
        np.testing.assert_allclose(cw, [50.0, 100.0 / 198.0])
        f = np.asarray(final)
        np.testing.assert_allclose(f[labels == -1], 50.0)

    def test_int64_labels_accepted(self):
        uniq, cw, sums, final = class_balance_weights(
            np.array([2, 2, 5], dtype=np.int64), np.ones(3))
        np.testing.assert_array_equal(np.asarray(uniq), [2, 5])
        np.testing.assert_allclose(np.asarray(cw), [3 / 4, 3 / 2])

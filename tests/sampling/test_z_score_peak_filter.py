"""z_score_peak_filter vs a plain NumPy loop oracle (the reference only
declares this filter; semantics documented in finmlkit_tpu/sampling/filters.py)."""
import numpy as np
import pytest

from finmlkit_tpu.sampling import z_score_peak_filter


def oracle(y, window, threshold):
    out = []
    for i in range(window, len(y)):
        w = y[i - window:i]
        m, s = w.mean(), w.std()
        if s > 0 and abs(y[i] - m) > threshold * s:
            out.append(i)
    return np.array(out, dtype=np.int64)


class TestZScorePeakFilter:
    def test_matches_numpy_oracle(self):
        r = np.random.default_rng(3)
        y = r.normal(0, 1, 2000)
        y[500] += 8.0
        y[1200] -= 9.0
        for window, thr in ((50, 3.0), (20, 2.5), (100, 4.0)):
            got = z_score_peak_filter(y, window, thr)
            np.testing.assert_array_equal(got, oracle(y, window, thr))

    def test_detects_injected_peaks(self):
        r = np.random.default_rng(4)
        y = r.normal(0, 0.1, 1000)
        y[300] = 5.0
        y[700] = -5.0
        ev = z_score_peak_filter(y, 50, 3.0)
        assert 300 in ev and 700 in ev

    def test_flat_series_no_events(self):
        y = np.ones(100)
        assert len(z_score_peak_filter(y, 10, 3.0)) == 0

    def test_validation(self):
        with pytest.raises(ValueError, match="window"):
            z_score_peak_filter(np.ones(50), 0, 3.0)
        with pytest.raises(ValueError, match="observations"):
            z_score_peak_filter(np.ones(5), 10, 3.0)

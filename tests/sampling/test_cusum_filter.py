"""CUSUM event filter tests vs sequential emulation of
/root/reference/finmlkit/sampling/filters.py:6-70 semantics."""
import numpy as np
import pytest

from finmlkit_tpu.sampling import cusum_filter


def _sequential(x, thr):
    n = len(x)
    if len(thr) == 1:
        thr = np.full(n, thr[0])
    lr = np.concatenate([[np.nan], np.log(x[1:] / x[:-1])])
    out = []
    s_pos = s_neg = 0.0
    for i in range(1, n):
        s_pos = max(0.0, s_pos + lr[i])
        s_neg = min(0.0, s_neg + lr[i])
        if s_neg < -thr[i]:
            s_neg = 0.0
            out.append(i)
        elif s_pos > thr[i]:
            s_pos = 0.0
            out.append(i)
    return np.array(out, dtype=np.int64)


class TestValidation:
    def test_too_short(self):
        with pytest.raises(ValueError, match="at least 2"):
            cusum_filter(np.array([1.0]), np.array([0.1]))

    def test_bad_threshold_len(self):
        with pytest.raises(ValueError, match="Threshold array"):
            cusum_filter(np.ones(5), np.array([0.1, 0.2]))


class TestEvents:
    def test_constant_threshold(self, trades_small):
        _, px, _, _ = trades_small
        thr = np.array([0.002])
        exp = _sequential(px, thr)
        got = cusum_filter(px, thr)
        np.testing.assert_array_equal(got, exp)
        assert len(got) > 5  # sanity: events actually fire

    def test_vector_threshold(self, trades_small):
        _, px, _, _ = trades_small
        r = np.random.default_rng(7)
        thr = 0.001 + 0.002 * r.random(len(px))
        exp = _sequential(px, thr)
        got = cusum_filter(px, thr)
        np.testing.assert_array_equal(got, exp)

    def test_strict_inequality_and_neg_precedence(self):
        # crafted: a move exactly equal to threshold must NOT trigger
        x = np.array([100.0, 100.0 * np.exp(0.01), 100.0 * np.exp(0.02)])
        got = cusum_filter(x, np.array([0.01]))
        # s_pos after step1 = 0.01 == thr -> no (strict >); after step2 =
        # 0.02 > 0.01 -> event at 2
        np.testing.assert_array_equal(got, [2])

    def test_buffer_regrow(self, trades_small):
        _, px, _, _ = trades_small
        thr = np.array([1e-6])  # very low threshold -> many events
        exp = _sequential(px, thr)
        got = cusum_filter(px, thr, max_events=16)  # force regrow path
        np.testing.assert_array_equal(got, exp)

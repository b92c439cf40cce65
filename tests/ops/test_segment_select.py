"""Device radix median selection vs np.median brackets.

Covers the scenarios that break naive selections: heavy duplication
(exchange amounts repeat constantly), empty bars sharing open positions,
single-trade bars, even/odd counts, and the full float32 dynamic range.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from finmlkit_tpu.ops.segment_select import segment_median_pair_select


def _bar_ids(ci, n):
    bar_id = np.zeros(n, np.int32)
    marks = np.zeros(n + 1, np.int64)
    np.add.at(marks, np.clip(ci[1:] + 1, 0, n), 1)
    bar_id = np.cumsum(marks[:n]).astype(np.int32)
    idx = np.arange(n)
    valid = (idx > ci[0]) & (idx <= ci[-1])
    return np.clip(bar_id, 0, len(ci) - 2), valid


def _expected(amounts, ci):
    out_a, out_b = [], []
    for i in range(len(ci) - 1):
        seg = amounts[ci[i] + 1:ci[i + 1] + 1]
        if len(seg) == 0:
            out_a.append(0.0)
            out_b.append(0.0)
            continue
        s = np.sort(seg)
        c = len(s)
        out_a.append(s[(c - 1) // 2])
        out_b.append(s[c // 2])
    return np.array(out_a, np.float32), np.array(out_b, np.float32)


def _run(amounts, ci, use_pallas):
    n = len(amounts)
    pad = (-n) % (256 * 128)
    n_pad = n + pad
    ap = np.concatenate([amounts, np.zeros(pad, np.float32)])
    bar_id, valid = _bar_ids(ci, n)
    bid = np.concatenate([bar_id, np.zeros(pad, np.int32)])
    vp = np.concatenate([valid, np.zeros(pad, bool)])
    a, b = segment_median_pair_select(
        jnp.asarray(ap), jnp.asarray(ci), jnp.asarray(bid), jnp.asarray(vp),
        n_pad=n_pad, interpret=use_pallas, use_pallas=use_pallas)
    return np.asarray(a), np.asarray(b)


@pytest.mark.parametrize("use_pallas", [False, True])
class TestMedianSelect:
    def test_random_lognormal_with_duplicates(self, use_pallas):
        r = np.random.default_rng(0)
        n = 6000
        amounts = np.maximum(np.round(r.lognormal(-2.5, 1.2, n), 3),
                             1e-3).astype(np.float32)  # heavy duplication
        closes = np.sort(r.choice(np.arange(1, n - 1), 60, replace=False))
        ci = np.concatenate([[-1], closes, [n - 1]]).astype(np.int64)
        ea, eb = _expected(amounts, ci)
        ga, gb = _run(amounts, ci, use_pallas)
        ne = np.diff(ci) > 0
        np.testing.assert_array_equal(ga[ne], ea[ne])
        np.testing.assert_array_equal(gb[ne], eb[ne])

    def test_empty_and_single_trade_bars(self, use_pallas):
        amounts = np.array([5.0, 1.0, 3.0, 2.0, 8.0], np.float32)
        # bar0: trades 0-1; bar1: EMPTY; bar2: trade 2 only; bar3: 3-4
        ci = np.array([-1, 1, 1, 2, 4], np.int64)
        ga, gb = _run(amounts, ci, use_pallas)
        np.testing.assert_array_equal(ga[[0, 2, 3]], [1.0, 3.0, 2.0])
        np.testing.assert_array_equal(gb[[0, 2, 3]], [5.0, 3.0, 8.0])

    def test_all_identical_values(self, use_pallas):
        amounts = np.full(300, 0.125, np.float32)
        ci = np.array([-1, 99, 199, 299], np.int64)
        ga, gb = _run(amounts, ci, use_pallas)
        np.testing.assert_array_equal(ga, 0.125)
        np.testing.assert_array_equal(gb, 0.125)

    def test_extreme_dynamic_range(self, use_pallas):
        r = np.random.default_rng(3)
        amounts = np.concatenate([
            np.full(50, 1e-5, np.float32),
            r.uniform(1e-5, 1e6, 100).astype(np.float32),
            np.full(50, 9.9e5, np.float32),
        ])
        r.shuffle(amounts)
        ci = np.array([-1, 49, 120, 199], np.int64)
        ea, eb = _expected(amounts, ci)
        ga, gb = _run(amounts, ci, use_pallas)
        np.testing.assert_array_equal(ga, ea)
        np.testing.assert_array_equal(gb, eb)

    def test_even_vs_odd_counts(self, use_pallas):
        amounts = np.array([4.0, 2.0, 1.0, 3.0,   7.0, 5.0, 6.0],
                           np.float32)
        ci = np.array([-1, 3, 6], np.int64)
        ga, gb = _run(amounts, ci, use_pallas)
        # even bar: middles 2,3; odd bar: 6,6
        np.testing.assert_array_equal(ga, [2.0, 6.0])
        np.testing.assert_array_equal(gb, [3.0, 6.0])

    def test_first_bar_not_at_origin(self, use_pallas):
        # leading trades outside any bar (ci[0] > -1)
        amounts = np.arange(1, 11, dtype=np.float32)
        ci = np.array([2, 6, 9], np.int64)
        ea, eb = _expected(amounts, ci)
        ga, gb = _run(amounts, ci, use_pallas)
        np.testing.assert_array_equal(ga, ea)
        np.testing.assert_array_equal(gb, eb)

    def test_large_random_vs_oracle(self, use_pallas):
        r = np.random.default_rng(7)
        n = 40000
        amounts = np.maximum(
            np.round(r.lognormal(-4, 1.5, n), 5), 1e-5).astype(np.float32)
        closes = np.sort(r.choice(np.arange(1, n - 1), 500, replace=False))
        ci = np.unique(np.concatenate([[-1], closes, [n - 1]])).astype(np.int64)
        # inject empty bars
        ci = np.sort(np.concatenate([ci, [ci[3], ci[10]]]))
        ea, eb = _expected(amounts, ci)
        ga, gb = _run(amounts, ci, use_pallas)
        ne = np.diff(ci) > 0
        np.testing.assert_array_equal(ga[ne], ea[ne])
        np.testing.assert_array_equal(gb[ne], eb[ne])


@pytest.mark.parametrize("bits", [4, 8])
def test_radix_width_equivalence(bits):
    r = np.random.default_rng(21)
    n = 20000
    amounts = np.maximum(np.round(r.lognormal(-3, 1.3, n), 4),
                         1e-4).astype(np.float32)
    closes = np.sort(r.choice(np.arange(1, n - 1), 120, replace=False))
    ci = np.concatenate([[-1], closes, [n - 1]]).astype(np.int64)
    pad = (-n) % (256 * 128)
    n_pad = n + pad
    ap = np.concatenate([amounts, np.zeros(pad, np.float32)])
    bar_id, valid = _bar_ids(ci, n)
    bid = np.concatenate([bar_id, np.zeros(pad, np.int32)])
    vp = np.concatenate([valid, np.zeros(pad, bool)])
    ea, eb = _expected(amounts, ci)
    ga, gb = segment_median_pair_select(
        jnp.asarray(ap), jnp.asarray(ci), jnp.asarray(bid), jnp.asarray(vp),
        n_pad=n_pad, interpret=False, use_pallas=False, bits_per_round=bits)
    np.testing.assert_array_equal(np.asarray(ga), ea)
    np.testing.assert_array_equal(np.asarray(gb), eb)

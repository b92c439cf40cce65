"""merge_split_trades anchor-semantics suite: the pathological cases the
reference's group-anchor 1e-8 tolerance produces
(/root/reference/finmlkit/bar/utils.py:263-329) — drifting sub-tolerance
prices must split once they stray from the ANCHOR (not the neighbor),
and zigzags back inside the anchor's tolerance must keep merging."""
import numpy as np
import pytest

from finmlkit_tpu.bar.data_model import merge_split_trades


def _oracle(ts, px, amt, ibm):
    """Sequential reimplementation of the reference walk (oracle)."""
    n = len(ts)
    m_ts, m_px, m_amt, m_side = [ts[0]], [px[0]], [np.float32(amt[0])], None
    with_side = ibm is not None
    if with_side:
        m_side = [-1 if ibm[0] else 1]
    for i in range(1, n):
        same = ts[i] == m_ts[-1] and abs(px[i] - m_px[-1]) < 1e-8
        if with_side:
            same &= bool(ibm[i]) == (m_side[-1] == -1)
        if same:
            m_amt[-1] = np.float32(m_amt[-1] + amt[i])
        else:
            m_ts.append(ts[i])
            m_px.append(px[i])
            m_amt.append(np.float32(amt[i]))
            if with_side:
                m_side.append(-1 if ibm[i] else 1)
    return (np.array(m_ts), np.array(m_px), np.array(m_amt, np.float32),
            np.array(m_side, np.int8) if with_side else np.empty(0, np.int8))


def test_plain_split_merge():
    ts = np.array([10, 10, 10, 20], np.int64)
    px = np.array([100.0, 100.0, 100.0, 101.0])
    amt = np.array([1, 2, 3, 4], np.float32)
    ibm = np.array([True, True, True, False])
    m_ts, m_px, m_amt, m_side = merge_split_trades(ts, px, amt, ibm)
    np.testing.assert_array_equal(m_ts, [10, 20])
    np.testing.assert_array_equal(m_amt, [6.0, 4.0])
    np.testing.assert_array_equal(m_side, [-1, 1])


def test_anchor_drift_splits():
    """Prices drifting by 0.6e-8 steps: each step is within the adjacent
    tolerance, but the third strays 1.2e-8 from the ANCHOR -> new group
    (the reference's group-anchor rule; an adjacent-pair comparison
    would wrongly merge all three)."""
    ts = np.full(3, 10, np.int64)
    px = np.array([100.0, 100.0 + 0.6e-8, 100.0 + 1.2e-8])
    amt = np.ones(3, np.float32)
    ibm = np.zeros(3, bool)
    m_ts, m_px, m_amt, m_side = merge_split_trades(ts, px, amt, ibm)
    o = _oracle(ts, px, amt, ibm)
    np.testing.assert_array_equal(m_px, o[1])
    assert len(m_px) == 2
    np.testing.assert_allclose(m_px, [100.0, 100.0 + 1.2e-8], rtol=0)
    np.testing.assert_array_equal(m_amt, [2.0, 1.0])


def test_zigzag_reenters_anchor_tolerance():
    """p1 dips 0.9e-8 below the anchor, p2 jumps 1.4e-8 up (adjacent
    split!) but lands 0.5e-8 from the anchor -> reference keeps merging."""
    ts = np.full(3, 10, np.int64)
    px = np.array([100.0, 100.0 - 0.9e-8, 100.0 + 0.5e-8])
    amt = np.ones(3, np.float32)
    ibm = np.zeros(3, bool)
    m_ts, m_px, m_amt, m_side = merge_split_trades(ts, px, amt, ibm)
    o = _oracle(ts, px, amt, ibm)
    np.testing.assert_array_equal(m_px, o[1])
    assert len(m_px) == 1
    assert m_amt[0] == 3.0


def test_side_breaks_group():
    ts = np.full(4, 10, np.int64)
    px = np.full(4, 100.0)
    amt = np.ones(4, np.float32)
    ibm = np.array([True, True, False, False])
    m_ts, m_px, m_amt, m_side = merge_split_trades(ts, px, amt, ibm)
    np.testing.assert_array_equal(m_side, [-1, 1])
    np.testing.assert_array_equal(m_amt, [2.0, 2.0])


def test_without_side_merges_across_maker_flag():
    ts = np.full(2, 10, np.int64)
    px = np.full(2, 100.0)
    amt = np.ones(2, np.float32)
    m_ts, m_px, m_amt, m_side = merge_split_trades(ts, px, amt, None)
    assert len(m_ts) == 1 and m_amt[0] == 2.0 and len(m_side) == 0


def test_tick_grid_prices_unaffected():
    """Normal tick-gridded data: every price step >= one tick, so the
    vectorized pass is exact and no greedy fixup triggers."""
    r = np.random.default_rng(8)
    n = 5000
    ts = np.sort(r.integers(0, 800, n)).astype(np.int64) * 1_000_000
    px = np.round(100 + r.integers(-50, 50, n) * 0.01, 2)
    amt = r.random(n).astype(np.float32)
    ibm = r.random(n) < 0.5
    got = merge_split_trades(ts, px, amt, ibm)
    want = _oracle(ts, px, amt, ibm)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-6)


def test_fuzz_subtolerance_noise_vs_oracle():
    """Adversarial fuzz: dense same-timestamp runs with sub-tolerance
    price noise — grouping must match the sequential oracle exactly."""
    r = np.random.default_rng(15)
    for trial in range(20):
        n = 400
        ts = np.sort(r.integers(0, 40, n)).astype(np.int64)
        base = r.choice([100.0, 100.01], n)
        noise = r.integers(-3, 4, n) * 0.4e-8
        px = base + noise
        amt = np.ones(n, np.float32)
        ibm = r.random(n) < 0.3
        got = merge_split_trades(ts, px, amt, ibm)
        want = _oracle(ts, px, amt, ibm)
        assert len(got[0]) == len(want[0]), f"trial {trial}"
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_allclose(got[1], want[1], rtol=0)
        np.testing.assert_allclose(got[2], want[2], rtol=1e-6)
        np.testing.assert_array_equal(got[3], want[3])

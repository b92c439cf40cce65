"""Histogram-select median engine (ops/segment_hist.py) vs np.median —
Pallas kernels in interpret mode on CPU (the same kernels compile
natively on the TPU; parity re-verified there, BENCH_NOTES.md)."""
import jax.numpy as jnp
import numpy as np
import pytest

from finmlkit_tpu.ops.segment_hist import segment_median_pair_hist


def _case(n, n_bars, ci0, seed, ties=True):
    r = np.random.default_rng(seed)
    amount = np.maximum(np.round(r.lognormal(-2.5, 1.2, n), 5),
                        1e-5).astype(np.float32)
    if ties:
        amount[::7] = amount[3]
    lo = max(ci0 + 1, 1)
    ci = np.concatenate([
        [ci0], np.sort(r.choice(np.arange(lo, n - 1), n_bars,
                                replace=False)), [n - 1]]).astype(np.int64)
    ci = np.unique(ci)
    ci = np.sort(np.concatenate([ci, [ci[min(5, len(ci) - 2)]]]))  # empty bar
    return amount, ci


@pytest.mark.parametrize("n,n_bars,ci0,seed", [
    (6000, 70, -1, 3),      # anchored stream + ties + empty bar
    (4000, 40, 7, 4),       # unaligned first bar (a0 start path)
    (3000, 25, -1, 5),      # small bars
    (513, 3, -1, 6),        # bars spanning row boundaries
])
def test_matches_np_median(n, n_bars, ci0, seed):
    amount, ci = _case(n, n_bars, ci0, seed)
    ma, mb = segment_median_pair_hist(jnp.asarray(amount), jnp.asarray(ci),
                                      interpret=True)
    ma = np.asarray(ma, np.float64)
    mb = np.asarray(mb, np.float64)
    for i in range(len(ci) - 1):
        lo, hi = ci[i] + 1, ci[i + 1] + 1
        if hi <= lo:
            continue  # empty bars return garbage (callers mask)
        seg = amount[lo:hi].astype(np.float64)
        assert (ma[i] + mb[i]) / 2 == np.median(seg), i
        # brackets are actual sample values
        assert np.float32(ma[i]) in amount[lo:hi]
        assert np.float32(mb[i]) in amount[lo:hi]


def test_matches_sort_engine_bitwise():
    from finmlkit_tpu.bar.fused import median_sort_device
    amount, ci = _case(5000, 60, -1, 21)
    amt_j, ci_j = jnp.asarray(amount), jnp.asarray(ci)
    h_a, h_b = segment_median_pair_hist(amt_j, ci_j, interpret=True)
    s_a, s_b = median_sort_device(amt_j, ci_j, interpret=True)
    ne = np.diff(ci) > 0
    np.testing.assert_array_equal(np.asarray(h_a)[ne], np.asarray(s_a)[ne])
    np.testing.assert_array_equal(np.asarray(h_b)[ne], np.asarray(s_b)[ne])


def test_single_trade_bars():
    n = 600
    amount = np.abs(np.random.default_rng(9).normal(1, 0.3, n)
                    ).astype(np.float32) + 0.01
    ci = np.arange(-1, n, 1).astype(np.int64)  # every bar has ONE trade
    ma, mb = segment_median_pair_hist(jnp.asarray(amount), jnp.asarray(ci),
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(ma), amount)
    np.testing.assert_array_equal(np.asarray(mb), amount)

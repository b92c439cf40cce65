"""Imbalance / run bar indexers vs a sequential NumPy oracle.

These bar types are declared-but-unimplemented in the reference
(bar/logic.py:224-261); the semantics tested here are the ones defined
in finmlkit_tpu/bar/indexers.py (AFML ch. 2.3.2, expectations updated
at bar closes).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from finmlkit_tpu.bar import indexers
from tests.conftest import generate_trades


def oracle(w, e_t, e_r, a_t, a_r, run_mode):
    """Sequential reference: walk trades from index 1, close at first
    crossing of theta = e_t*e_r, reset in-bar state, EMA-update at close."""
    closes = []
    cb = cs = 0.0
    open_pos = 0
    for i in range(1, len(w)):
        if run_mode:
            if w[i] > 0:
                cb += w[i]
            elif w[i] < 0:
                cs += -w[i]
            stat = max(cb, cs)
        else:
            cb += w[i]
            stat = abs(cb)
        if stat >= e_t * e_r:
            closes.append(i)
            t_bar = i - open_pos
            rate = stat / max(t_bar, 1.0)
            e_t = (1 - a_t) * e_t + a_t * t_bar
            e_r = (1 - a_r) * e_r + a_r * rate
            cb = cs = 0.0
            open_pos = i
    return np.array([0] + closes, dtype=np.int64)


@pytest.fixture
def trades():
    return generate_trades(n=6000, seed=11)


class TestImbalanceBars:
    def test_fixed_threshold_tick_mode(self, trades):
        ts, px, amt, side = trades
        _, ci = indexers.imbalance_bar_indexer(
            jnp.asarray(ts), jnp.asarray(side), threshold=17.0)
        exp = oracle(side.astype(np.float64), 1.0, 17.0, 0, 0, False)
        np.testing.assert_array_equal(np.asarray(ci), exp)

    def test_fixed_threshold_volume_mode(self, trades):
        ts, px, amt, side = trades
        _, ci = indexers.imbalance_bar_indexer(
            jnp.asarray(ts), jnp.asarray(side), jnp.asarray(amt),
            threshold=1.5)
        w = side.astype(np.float64) * amt.astype(np.float64)
        exp = oracle(w, 1.0, 1.5, 0, 0, False)
        np.testing.assert_array_equal(np.asarray(ci), exp)

    def test_ema_adaptive(self, trades):
        ts, px, amt, side = trades
        _, ci = indexers.imbalance_bar_indexer(
            jnp.asarray(ts), jnp.asarray(side),
            expected_ticks_init=50.0, expected_rate_init=0.3,
            alpha_ticks=0.1, alpha_rate=0.05)
        exp = oracle(side.astype(np.float64), 50.0, 0.3, 0.1, 0.05, False)
        np.testing.assert_array_equal(np.asarray(ci), exp)
        assert len(exp) > 5  # the workload actually produces bars

    def test_close_ts_match_indices(self, trades):
        ts, px, amt, side = trades
        cts, ci = indexers.imbalance_bar_indexer(
            jnp.asarray(ts), jnp.asarray(side), threshold=25.0)
        np.testing.assert_array_equal(np.asarray(cts), ts[np.asarray(ci)])

    def test_param_validation(self, trades):
        ts, px, amt, side = trades
        with pytest.raises(ValueError, match="fixed mode"):
            indexers.imbalance_bar_indexer(
                jnp.asarray(ts), jnp.asarray(side), threshold=5.0,
                alpha_ticks=0.1)
        with pytest.raises(ValueError, match="provide either"):
            indexers.imbalance_bar_indexer(jnp.asarray(ts), jnp.asarray(side))

    def test_f32_mode_close(self, trades):
        # TPU fast path: boundaries may only differ at exact-threshold ties
        ts, px, amt, side = trades
        _, ci64 = indexers.imbalance_bar_indexer(
            jnp.asarray(ts), jnp.asarray(side), threshold=17.0)
        _, ci32 = indexers.imbalance_bar_indexer(
            jnp.asarray(ts), jnp.asarray(side), threshold=17.0,
            dtype="float32")
        np.testing.assert_array_equal(np.asarray(ci64), np.asarray(ci32))


class TestRunBars:
    def test_fixed_threshold_tick_runs(self, trades):
        ts, px, amt, side = trades
        _, ci = indexers.run_bar_indexer(
            jnp.asarray(ts), jnp.asarray(side), threshold=30.0)
        exp = oracle(side.astype(np.float64), 1.0, 30.0, 0, 0, True)
        np.testing.assert_array_equal(np.asarray(ci), exp)

    def test_ema_adaptive_volume_runs(self, trades):
        ts, px, amt, side = trades
        _, ci = indexers.run_bar_indexer(
            jnp.asarray(ts), jnp.asarray(side), jnp.asarray(amt),
            expected_ticks_init=80.0, expected_rate_init=0.05,
            alpha_ticks=0.2, alpha_rate=0.1)
        w = side.astype(np.float64) * amt.astype(np.float64)
        exp = oracle(w, 80.0, 0.05, 0.2, 0.1, True)
        np.testing.assert_array_equal(np.asarray(ci), exp)

    def test_runs_close_faster_than_imbalance(self, trades):
        # max(buy,sell) >= |buy-sell| pointwise, so run bars can never be
        # longer than imbalance bars at the same fixed threshold
        ts, px, amt, side = trades
        _, ci_run = indexers.run_bar_indexer(
            jnp.asarray(ts), jnp.asarray(side), threshold=20.0)
        _, ci_imb = indexers.imbalance_bar_indexer(
            jnp.asarray(ts), jnp.asarray(side), threshold=20.0)
        assert len(ci_run) >= len(ci_imb)


class TestInfoBarKits:
    def test_imbalance_kit_end_to_end(self, trades):
        from finmlkit_tpu.bar import ImbalanceBarKit, TradesData
        ts, px, amt, side = trades
        td = TradesData(ts, px, amt, id=np.arange(len(ts)), preprocess=True)
        kit = ImbalanceBarKit(td, mode="tick", threshold=17.0)
        df = kit.build_ohlcv()
        assert len(df) > 1
        assert (df["volume"].values >= 0).all()
        assert df["close"].notna().all()

    def test_run_kit_dollar_mode(self, trades):
        from finmlkit_tpu.bar import RunBarKit, TradesData
        ts, px, amt, side = trades
        td = TradesData(ts, px, amt, id=np.arange(len(ts)), preprocess=True)
        kit = RunBarKit(td, mode="dollar", expected_ticks_init=100.0,
                        expected_rate_init=20.0, alpha_ticks=0.1,
                        alpha_rate=0.1)
        df = kit.build_ohlcv()
        assert len(df) > 1

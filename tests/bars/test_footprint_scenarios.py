"""Deep scenario matrix for footprint features.

Mirrors the reference's tests/bars/test_footprint_features.py coverage
(semantics, not code): single/two price levels, zero volumes, imbalance
thresholds at edge levels, max signed run edge cases (alternating, long
sequences), COT tie-breaking and edge levels, vp_skew
concentration/sign, vp_gini bounds and consistency
(/root/reference/finmlkit/bar/base.py:755-850).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from finmlkit_tpu.bar.footprint import footprint_features_from_tensors


def run_feat(buy_vol, sell_vol, low=None, mult=3.0):
    """Single-bar convenience wrapper over the dense-tensor kernel."""
    buy_vol = np.atleast_2d(np.asarray(buy_vol, np.float32))
    sell_vol = np.atleast_2d(np.asarray(sell_vol, np.float32))
    nb, L = buy_vol.shape
    low = np.full(nb, 200, np.int32) if low is None else np.asarray(low, np.int32)
    n_levels = np.full(nb, L, np.int32)
    ticks = np.ones((nb, L), np.int32)
    out = footprint_features_from_tensors(
        jnp.asarray(low), jnp.asarray(n_levels), jnp.asarray(buy_vol),
        jnp.asarray(sell_vol), jnp.asarray(ticks), jnp.asarray(ticks),
        mult)
    return {k: np.asarray(v) for k, v in out.items()}


class TestImbalanceFlags:
    def test_single_level_no_imbalance_possible(self):
        out = run_feat([[10.0]], [[10.0]])
        assert out["buy_imbalances_sum"][0] == 0
        assert out["sell_imbalances_sum"][0] == 0
        assert out["imb_max_run_signed"][0] == 0

    def test_buy_imbalance_diagonal_semantics(self):
        # buy[l+1] > sell[l] * mult flags a buy imbalance AT level l+1
        buy = [[0.0, 31.0]]
        sell = [[10.0, 0.0]]
        out = run_feat(buy, sell, mult=3.0)
        assert out["buy_imbalances"][0].tolist() == [False, True]
        assert out["sell_imbalances"][0].tolist() == [False, False]

    def test_buy_imbalance_exactly_at_threshold_not_flagged(self):
        # strict inequality: 30 == 10*3 is NOT an imbalance
        out = run_feat([[0.0, 30.0]], [[10.0, 0.0]], mult=3.0)
        assert out["buy_imbalances_sum"][0] == 0

    def test_sell_imbalance_diagonal_semantics(self):
        # sell[l] > buy[l+1] * mult flags a sell imbalance AT level l
        out = run_feat([[0.0, 5.0]], [[16.0, 0.0]], mult=3.0)
        assert out["sell_imbalances"][0].tolist() == [True, False]
        assert out["buy_imbalances"][0].tolist() == [False, False]

    def test_zero_volume_pairs_no_flags(self):
        # sell[l]=0 vs buy[l+1]=0: 0 > 0*mult is false both ways
        out = run_feat([[0.0, 0.0, 0.0]], [[0.0, 0.0, 0.0]])
        assert out["buy_imbalances_sum"][0] == 0
        assert out["sell_imbalances_sum"][0] == 0

    def test_zero_sell_any_buy_flags(self):
        # buy[l+1]=1 vs sell[l]=0: 1 > 0 -> flagged
        out = run_feat([[0.0, 1.0]], [[0.0, 0.0]], mult=3.0)
        assert out["buy_imbalances"][0, 1]

    def test_edge_levels_cannot_flag_outside(self):
        # top level has no l+1 partner; bottom sell level needs buy above
        buy = [[100.0, 0.0, 0.0]]
        sell = [[0.0, 0.0, 100.0]]
        out = run_feat(buy, sell, mult=1.0)
        # buy[0] has no sell[-1] partner -> no flag at level 0
        assert not out["buy_imbalances"][0, 0]
        # sell[2] has no buy[3] -> pair_ok masks it out
        assert not out["sell_imbalances"][0, 2]

    def test_counts_sum_flags(self):
        buy = [[0.0, 40.0, 0.0, 50.0]]
        sell = [[10.0, 0.0, 10.0, 0.0]]
        out = run_feat(buy, sell, mult=3.0)
        assert out["buy_imbalances_sum"][0] == 2
        assert out["sell_imbalances_sum"][0] == 0


class TestMaxSignedRun:
    @pytest.mark.parametrize("buy,sell,expected", [
        # single buy imbalance -> run +1
        ([[0.0, 40.0]], [[10.0, 0.0]], 1),
        # two consecutive buy imbalances -> +2
        ([[0.0, 40.0, 40.0]], [[10.0, 10.0, 0.0]], 2),
        # no imbalances
        ([[1.0, 1.0, 1.0]], [[1.0, 1.0, 1.0]], 0),
    ])
    def test_basic_runs(self, buy, sell, expected):
        out = run_feat(buy, sell, mult=3.0)
        assert out["imb_max_run_signed"][0] == expected

    def test_alternating_runs_capped_at_one(self):
        # buy imb at levels 1,3; sell imb at 2 — no two consecutive same
        buy = [[0.0, 40.0, 0.0, 40.0]]
        sell = [[10.0, 0.0, 200.0, 0.0]]
        out = run_feat(buy, sell, mult=3.0)
        assert abs(out["imb_max_run_signed"][0]) == 1

    def test_long_sell_run_negative_sign(self):
        # sell imbalances at levels 0..3 (sell[l] >> buy[l+1])
        buy = [[0.0, 1.0, 1.0, 1.0, 1.0]]
        sell = [[50.0, 50.0, 50.0, 50.0, 0.0]]
        out = run_feat(buy, sell, mult=3.0)
        assert out["imb_max_run_signed"][0] == -4

    def test_longer_later_run_wins(self):
        # short buy run (+1 at level 1) then longer sell run (levels 2-4)
        buy = [[0.0, 40.0, 0.0, 1.0, 1.0, 1.0]]
        sell = [[10.0, 0.0, 50.0, 50.0, 50.0, 0.0]]
        out = run_feat(buy, sell, mult=3.0)
        # flags: buy@1 (40>10*3); sell@2,3,4 (50 > next buy*3)
        assert out["imb_max_run_signed"][0] == -3

    def test_tie_keeps_first_run(self):
        # +2 buy run (levels 1,2) then -2 sell run (levels 3,4): the
        # kernel's strict `run > max_run` keeps the earlier run on ties
        buy = [[0.0, 40.0, 40.0, 0.0, 0.0, 1.0]]
        sell = [[10.0, 10.0, 0.0, 50.0, 50.0, 0.0]]
        out = run_feat(buy, sell, mult=3.0)
        assert out["imb_max_run_signed"][0] == 2


class TestCOT:
    def test_clear_winner(self):
        buy = [[1.0, 10.0, 1.0]]
        sell = [[1.0, 10.0, 1.0]]
        out = run_feat(buy, sell, low=[500])
        assert out["cot_price_levels"][0] == 501

    def test_tie_takes_first_level(self):
        # equal totals at levels 0 and 2 -> argmax returns the lowest
        buy = [[5.0, 1.0, 5.0]]
        sell = [[5.0, 1.0, 5.0]]
        out = run_feat(buy, sell, low=[300])
        assert out["cot_price_levels"][0] == 300

    def test_edge_top_level(self):
        buy = [[1.0, 1.0, 99.0]]
        sell = [[0.0, 0.0, 0.0]]
        out = run_feat(buy, sell, low=[100])
        assert out["cot_price_levels"][0] == 102

    def test_all_zero_volume_defaults_to_low(self):
        out = run_feat([[0.0, 0.0]], [[0.0, 0.0]], low=[700])
        assert out["cot_price_levels"][0] == 700


class TestSkewAndGini:
    def test_skew_symmetric_zero(self):
        buy = [[5.0, 0.0, 5.0]]
        sell = [[5.0, 0.0, 5.0]]
        out = run_feat(buy, sell)
        np.testing.assert_allclose(out["vp_skew"][0], 0.0, atol=1e-9)

    def test_skew_single_level_zero(self):
        out = run_feat([[42.0]], [[13.0]])
        np.testing.assert_allclose(out["vp_skew"][0], 0.0, atol=1e-9)

    def test_skew_first_moment_quirk_parity(self):
        # The reference computes vp_skew as the FIRST moment about its own
        # volume-weighted mean (bar/base.py:840-846) — mathematically zero
        # for every profile, up to float rounding. We replicate that quirk
        # bit-for-bit rather than "fixing" it to a genuine skewness.
        for buy in ([[1.0, 1.0, 50.0]], [[50.0, 1.0, 1.0]],
                    [[1.0, 0.0, 0.0, 0.0, 50.0]]):
            out = run_feat(buy, [[0.0] * len(buy[0])])
            np.testing.assert_allclose(out["vp_skew"][0], 0.0, atol=1e-10)

    def test_gini_uniform_distribution(self):
        buy = [[2.5, 2.5, 2.5, 2.5]]
        sell = [[0.0, 0.0, 0.0, 0.0]]
        out = run_feat(buy, sell)
        np.testing.assert_allclose(out["vp_gini"][0], 1.0 - 4 * 0.25 ** 2,
                                   rtol=1e-6)

    def test_gini_perfect_concentration_zero(self):
        out = run_feat([[0.0, 100.0, 0.0]], [[0.0, 0.0, 0.0]])
        np.testing.assert_allclose(out["vp_gini"][0], 0.0, atol=1e-7)

    def test_gini_bounds_random(self):
        r = np.random.default_rng(5)
        buy = r.random((20, 6)).astype(np.float32)
        sell = r.random((20, 6)).astype(np.float32)
        out = run_feat(buy, sell)
        g = out["vp_gini"]
        assert np.all(g >= -1e-9) and np.all(g < 1.0)

    def test_gini_consistency_buy_sell_merged(self):
        # gini depends only on total per-level volume
        a = run_feat([[3.0, 1.0]], [[0.0, 2.0]])
        b = run_feat([[0.0, 0.0]], [[3.0, 3.0]])
        np.testing.assert_allclose(a["vp_gini"][0], b["vp_gini"][0],
                                   rtol=1e-6)

    def test_zero_volume_bar_safe(self):
        out = run_feat([[0.0, 0.0]], [[0.0, 0.0]])
        assert out["vp_gini"][0] == 0.0
        assert out["vp_skew"][0] == 0.0


class TestMultiBarBatch:
    def test_features_independent_across_bars(self):
        buy = np.zeros((3, 4), np.float32)
        sell = np.zeros((3, 4), np.float32)
        buy[0] = [0.0, 40.0, 40.0, 0.0]
        sell[0] = [10.0, 10.0, 0.0, 0.0]
        buy[2] = [1.0, 1.0, 1.0, 1.0]
        sell[2] = [1.0, 1.0, 1.0, 1.0]
        out = run_feat(buy, sell, low=[10, 20, 30])
        assert out["imb_max_run_signed"][0] == 2
        assert out["imb_max_run_signed"][1] == 0   # empty bar
        assert out["imb_max_run_signed"][2] == 0   # balanced bar
        assert out["cot_price_levels"].tolist() == [11, 20, 30]

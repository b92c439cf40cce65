"""Footprint kernel tests: hand-computed per-level aggregation and
feature semantics per /root/reference/finmlkit/bar/base.py:615-850."""
import jax.numpy as jnp
import numpy as np

from finmlkit_tpu.bar.footprint import comp_bar_footprints


def run_fp(prices, amounts, ci, sides, tick, lows, highs, mult=3.0, L=8):
    out = comp_bar_footprints(
        jnp.asarray(prices), jnp.asarray(amounts, dtype=jnp.float32),
        jnp.asarray(ci, dtype=jnp.int64), jnp.asarray(sides, dtype=jnp.int8),
        tick, jnp.asarray(lows), jnp.asarray(highs), mult, max_levels=L)
    return {k: np.asarray(v) for k, v in out.items()}


class TestFootprintAggregation:
    def test_per_level_volumes(self):
        # one bar, tick=0.5, prices at 100.0, 100.5, 101.0
        prices = np.array([100.0, 100.0, 100.5, 101.0, 100.5])
        amounts = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        sides = np.array([1, 1, -1, 1, -1])
        ci = np.array([-1, 4])
        out = run_fp(prices, amounts, ci, sides, 0.5,
                     lows=np.array([100.0]), highs=np.array([101.0]))
        assert out["low_level"][0] == 200
        assert out["n_levels"][0] == 3
        np.testing.assert_allclose(out["buy_volumes"][0, :3], [3.0, 0.0, 4.0])
        np.testing.assert_allclose(out["sell_volumes"][0, :3], [0.0, 8.0, 0.0])
        np.testing.assert_array_equal(out["buy_ticks"][0, :3], [2, 0, 1])
        np.testing.assert_array_equal(out["sell_ticks"][0, :3], [0, 2, 0])

    def test_cot_and_vp(self):
        prices = np.array([100.0, 100.0, 100.5, 101.0, 100.5])
        amounts = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        sides = np.array([1, 1, -1, 1, -1])
        ci = np.array([-1, 4])
        out = run_fp(prices, amounts, ci, sides, 0.5,
                     lows=np.array([100.0]), highs=np.array([101.0]))
        total = np.array([3.0, 8.0, 4.0])
        levels = np.array([200, 201, 202])
        assert out["cot_price_levels"][0] == 201
        vwap = np.sum(levels * total) / total.sum()
        np.testing.assert_allclose(
            out["vp_skew"][0], np.sum((levels - vwap) * total) / total.sum(),
            rtol=1e-6)
        np.testing.assert_allclose(
            out["vp_gini"][0], 1 - np.sum((total / total.sum()) ** 2), rtol=1e-6)

    def test_imbalances_and_run(self):
        # craft diagonal imbalance: sell[l] > buy[l+1]*3
        prices = np.array([100.0, 100.0, 100.5, 100.5, 101.0])
        amounts = np.array([10.0, 1.0, 10.0, 1.0, 1.0])
        sides = np.array([-1, 1, -1, 1, 1])
        ci = np.array([-1, 4])
        out = run_fp(prices, amounts, ci, sides, 0.5,
                     lows=np.array([100.0]), highs=np.array([101.0]))
        # sell vol: [10, 10, 0]; buy vol: [1, 1, 1]
        # sell_imb[l] = sell[l] > buy[l+1]*3: l0: 10>3 T; l1: 10>3 T
        np.testing.assert_array_equal(out["sell_imbalances"][0, :3],
                                      [True, True, False])
        # buy_imb[l+1] = buy[l+1] > sell[l]*3: F, F
        np.testing.assert_array_equal(out["buy_imbalances"][0, :3],
                                      [False, False, False])
        assert out["sell_imbalances_sum"][0] == 2
        assert out["buy_imbalances_sum"][0] == 0
        assert out["imb_max_run_signed"][0] == -2

    def test_single_level_no_imbalance(self):
        prices = np.array([100.0, 100.0])
        amounts = np.array([1.0, 1.0])
        sides = np.array([1, -1])
        ci = np.array([-1, 1])
        out = run_fp(prices, amounts, ci, sides, 0.5,
                     lows=np.array([100.0]), highs=np.array([100.0]))
        assert out["n_levels"][0] == 1
        assert not out["buy_imbalances"][0].any()
        assert not out["sell_imbalances"][0].any()
        assert out["imb_max_run_signed"][0] == 0

    def test_multi_bar(self):
        prices = np.array([100.0, 100.5, 100.0, 101.0, 101.5, 101.0])
        amounts = np.ones(6)
        sides = np.array([1, 1, -1, 1, -1, 1])
        ci = np.array([-1, 2, 5])
        out = run_fp(prices, amounts, ci, sides, 0.5,
                     lows=np.array([100.0, 101.0]),
                     highs=np.array([100.5, 101.5]))
        assert out["n_levels"][0] == 2
        assert out["n_levels"][1] == 2
        np.testing.assert_allclose(out["buy_volumes"][0, :2], [1.0, 1.0])
        np.testing.assert_allclose(out["sell_volumes"][0, :2], [1.0, 0.0])
        np.testing.assert_allclose(out["buy_volumes"][1, :2], [2.0, 0.0])
        np.testing.assert_allclose(out["sell_volumes"][1, :2], [0.0, 1.0])


class TestFootprintQ:
    def test_q_matches_f64_path(self, trades_small):
        import pandas as pd
        from finmlkit_tpu.bar import TradesData, TimeBarKit
        from finmlkit_tpu.bar import footprint as fp64
        ts, px, amt, side = trades_small
        ids = np.arange(len(ts), dtype=np.int64)
        td = TradesData(ts, px, amt.astype(np.float32), ids,
                        timestamp_unit="ns", preprocess=True)
        kit = TimeBarKit(td, pd.Timedelta(minutes=2))
        kit.build_ohlcv()
        # q path (tick grid == footprint grid via kit dispatch)
        fpq = kit.build_footprints(price_tick_size=kit._tick_size)
        # f64 path, forced
        kit2 = TimeBarKit(td, pd.Timedelta(minutes=2))
        kit2.build_ohlcv()
        kit2._ticks = None
        fpr = kit2.build_footprints(price_tick_size=kit._tick_size)
        np.testing.assert_array_equal(fpq.low_level, fpr.low_level)
        np.testing.assert_array_equal(fpq.n_levels, fpr.n_levels)
        L = min(fpq.buy_volumes.shape[1], fpr.buy_volumes.shape[1])
        np.testing.assert_allclose(fpq.buy_volumes[:, :L],
                                   fpr.buy_volumes[:, :L], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(fpq.buy_ticks[:, :L], fpr.buy_ticks[:, :L])
        np.testing.assert_array_equal(fpq.sell_ticks[:, :L], fpr.sell_ticks[:, :L])
        np.testing.assert_array_equal(fpq.buy_imbalances[:, :L],
                                      fpr.buy_imbalances[:, :L])
        np.testing.assert_array_equal(fpq.imb_max_run_signed,
                                      fpr.imb_max_run_signed)
        np.testing.assert_array_equal(fpq.cot_price_levels, fpr.cot_price_levels)
        np.testing.assert_allclose(fpq.vp_skew, fpr.vp_skew, atol=2e-4)
        np.testing.assert_allclose(fpq.vp_gini, fpr.vp_gini, atol=2e-5)

"""Klines builder/reader tests: 1s bar persistence + resampling parity
with pandas (reference pattern: tests/bars/test_io.py)."""
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.bar import TradesData
from finmlkit_tpu.data import AddTimeBarH5, TimeBarReader


@pytest.fixture
def store_with_klines(tmp_path, trades_small):
    ts, px, amt, side = trades_small
    ids = np.arange(len(ts), dtype=np.int64)
    td = TradesData(ts, px, amt.astype(np.float32), ids,
                    timestamp_unit="ns", preprocess=True)
    path = str(tmp_path / "trades.h5")
    td.save_h5(path)
    builder = AddTimeBarH5(path)
    results = builder.process_all()
    assert all(results.values())
    return path


class TestAddTimeBar:
    def test_skip_existing(self, store_with_klines):
        builder = AddTimeBarH5(store_with_klines)
        results = builder.process_all(overwrite=False)
        assert not any(results.values())  # all skipped

    def test_overwrite(self, store_with_klines):
        builder = AddTimeBarH5(store_with_klines)
        results = builder.process_all(overwrite=True)
        assert all(results.values())


class TestTimeBarReader:
    def test_read_1s(self, store_with_klines):
        reader = TimeBarReader(store_with_klines)
        df = reader.read()
        assert len(df) > 0
        assert {"open", "high", "low", "close", "volume", "trades",
                "vwap", "median_trade_size"} <= set(df.columns)
        first, last = reader.get_time_range()
        assert first <= last

    def test_range_filter(self, store_with_klines):
        reader = TimeBarReader(store_with_klines)
        full = reader.read()
        mid = full.index[len(full) // 2]
        part = reader.read(start_time=mid)
        assert len(part) < len(full)
        assert part.index[0] >= mid

    def test_resample_vs_pandas(self, store_with_klines):
        reader = TimeBarReader(store_with_klines)
        df1s = reader.read()
        df1m = reader.read(timeframe="1min")
        g = df1s.groupby(df1s.index.floor("1min"))
        exp_high = g["high"].max()
        exp_vol = g["volume"].sum()
        joined = df1m.join(exp_high.rename("eh")).join(exp_vol.rename("ev"))
        np.testing.assert_allclose(joined["high"], joined["eh"], rtol=1e-12)
        np.testing.assert_allclose(joined["volume"], joined["ev"], rtol=1e-6)
        # vwap is volume-weighted
        vw = (df1s["vwap"] * df1s["volume"]).groupby(df1s.index.floor("1min")).sum() \
            / df1s["volume"].groupby(df1s.index.floor("1min")).sum()
        np.testing.assert_allclose(df1m["vwap"].values,
                                   vw.loc[df1m.index].values.astype(np.float32),
                                   rtol=1e-5)


class TestResampleScenarios:
    @pytest.mark.parametrize("tf", ["5min", "15min", "1h"])
    def test_ohlc_parity_multi_timeframe(self, store_with_klines, tf):
        reader = TimeBarReader(store_with_klines)
        df1s = reader.read()
        dftf = reader.read(timeframe=tf)
        g = df1s.groupby(df1s.index.floor(tf))
        np.testing.assert_allclose(dftf["open"], g["open"].first(),
                                   rtol=1e-12)
        np.testing.assert_allclose(dftf["close"], g["close"].last(),
                                   rtol=1e-12)
        np.testing.assert_allclose(dftf["low"], g["low"].min(), rtol=1e-12)
        np.testing.assert_array_equal(dftf["trades"], g["trades"].sum())

    def test_weighted_median_between_bounds(self, store_with_klines):
        reader = TimeBarReader(store_with_klines)
        df1s = reader.read()
        df5 = reader.read(timeframe="5min")
        g = df1s.groupby(df1s.index.floor("5min"))
        lo = g["median_trade_size"].min()
        hi = g["median_trade_size"].max()
        assert np.all(df5["median_trade_size"].values >= lo.values - 1e-9)
        assert np.all(df5["median_trade_size"].values <= hi.values + 1e-9)

    def test_single_dominant_second_drives_median(self, store_with_klines):
        # weighted median follows trade counts: a second holding nearly
        # all trades dominates the per-window weighted median
        reader = TimeBarReader(store_with_klines)
        df1s = reader.read()
        win = df1s.index.floor("5min")[0]
        sub = df1s[df1s.index.floor("5min") == win]
        dominant = sub.loc[sub["trades"].idxmax()]
        if dominant["trades"] > sub["trades"].sum() * 0.5:
            df5 = reader.read(timeframe="5min")
            np.testing.assert_allclose(df5.loc[win, "median_trade_size"],
                                       dominant["median_trade_size"],
                                       rtol=1e-6)

    def test_empty_range_returns_empty(self, store_with_klines):
        reader = TimeBarReader(store_with_klines)
        df = reader.read(start_time="2099-01-01", end_time="2099-01-02")
        assert len(df) == 0

    def test_range_plus_resample_compose(self, store_with_klines):
        reader = TimeBarReader(store_with_klines)
        full = reader.read(timeframe="5min")
        if len(full) >= 3:
            start = full.index[1]
            part = reader.read(start_time=start, timeframe="5min")
            np.testing.assert_allclose(part["close"],
                                       full.loc[start:, "close"],
                                       rtol=1e-12)

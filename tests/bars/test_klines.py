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

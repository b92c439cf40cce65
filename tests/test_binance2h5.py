"""Acquisition CLI tests on a local synthetic ZIP (no network): CSV
normalization, preprocess worker, pipeline-parallel writer, klines."""
import io
import sys
import zipfile
from pathlib import Path

import h5py
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.cli import binance2h5  # noqa: E402


@pytest.fixture
def trade_zip(tmp_path, rng):
    n = 20000
    ts = 1_700_000_000_000 + np.cumsum(
        rng.integers(1, 400, n)).astype(np.int64)  # ms
    price = np.round(40_000 * np.exp(np.cumsum(rng.normal(0, 5e-5, n))), 1)
    qty = np.round(rng.lognormal(-3, 1.3, n), 5)
    df = pd.DataFrame({
        "id": np.arange(n),
        "price": price,
        "qty": qty,
        "quote_qty": np.round(price * qty, 2),
        "time": ts,
        "is_buyer_maker": rng.random(n) < 0.5,
    })
    zpath = tmp_path / "BTCUSDT-trades-2023-11.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("BTCUSDT-trades-2023-11.csv",
                   df.to_csv(index=False, header=False))
    return str(zpath), df


class TestPipeline:
    def test_load_csv_from_zip(self, trade_zip):
        zpath, df = trade_zip
        loaded = binance2h5.load_csv_from_zip(zpath)
        assert list(loaded.columns) == binance2h5._COLS
        assert len(loaded) == len(df)

    def test_process_task(self, trade_zip):
        zpath, df = trade_zip
        month, cols, ok, missing, disc = binance2h5._process_task(
            (zpath, "2023-11"))
        assert month == "2023-11"
        assert cols["timestamp"][0] > 1e18  # converted to ns
        assert set(cols) == {"timestamp", "price", "amount", "side"}
        assert ok is True

    def test_process_all_and_klines(self, trade_zip, tmp_path):
        zpath, df = trade_zip
        h5_path = str(tmp_path / "BTCUSDT.h5")
        binance2h5.process_all([(zpath, "2023-11")], h5_path, workers=1)
        with h5py.File(h5_path, "r") as f:
            assert "/trades/2023-11" in f
            assert f["/meta/2023-11"].attrs["record_count"] > 0
        from finmlkit_tpu.data import AddTimeBarH5, TimeBarReader
        results = AddTimeBarH5(h5_path).process_all()
        assert all(results.values())
        bars = TimeBarReader(h5_path).read(timeframe="1min")
        assert len(bars) > 0

    def test_checksum(self, trade_zip, tmp_path):
        import hashlib
        zpath, _ = trade_zip
        digest = hashlib.sha256(open(zpath, "rb").read()).hexdigest()
        cs = tmp_path / "x.CHECKSUM"
        cs.write_text(f"{digest}  file.zip\n")
        assert binance2h5.verify_checksum(zpath, str(cs))
        cs.write_text("deadbeef  file.zip\n")
        assert not binance2h5.verify_checksum(zpath, str(cs))

    def test_month_range(self):
        assert list(binance2h5.month_range("2023-11", "2024-02")) == [
            "2023-11", "2023-12", "2024-01", "2024-02"]


class TestWriterFailureContainment:
    def test_writer_error_reraised_without_deadlock(self, trade_zip,
                                                    tmp_path, monkeypatch):
        """A failing H5 write must not deadlock the bounded queue: the
        writer keeps draining, records the error, and process_all
        re-raises after join (ADVICE round-2 finding)."""
        zpath, _ = trade_zip

        def boom(*a, **kw):
            raise OSError("disk full (synthetic)")

        from finmlkit_tpu.data import store as store_mod
        monkeypatch.setattr(store_mod, "save_trades_h5", boom)
        h5 = str(tmp_path / "out.h5")
        with pytest.raises(OSError, match="disk full"):
            # several months through a maxsize=2 queue exercises the
            # drain-on-error path; workers=1 keeps it in-process
            binance2h5.process_all(
                [(zpath, "2023-11")] * 4, h5, workers=1)

    def test_fail_fast_drains_without_writing(self, trade_zip, tmp_path,
                                              monkeypatch):
        # after the first failure the writer drains remaining months
        # WITHOUT writing (fail-fast: a partial store would mask the
        # error), and the producer never deadlocks on the bounded queue
        zpath, _ = trade_zip
        from finmlkit_tpu.data import store as store_mod
        calls = {"n": 0}

        def flaky(shim, path, month_key=None, **kw):
            calls["n"] += 1
            raise OSError("write fails")

        monkeypatch.setattr(store_mod, "save_trades_h5", flaky)
        h5 = str(tmp_path / "out.h5")
        with pytest.raises(OSError):
            binance2h5.process_all([(zpath, "2023-11")] * 3, h5, workers=1)
        assert calls["n"] == 1  # later months drained, not retried
        import os
        assert not os.path.exists(h5)

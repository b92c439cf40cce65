"""Monthly-store range filtering and key selection — the analog of the
reference's HDF5 index/where-clause suite
(/root/reference/tests/bars/test_hdf5_index_and_filtering.py): time-range
selects must hit only the overlapping monthly groups, respect inclusive
boundaries, restore a DatetimeIndex, and error on empty ranges."""
import h5py
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.bar.data_model import TradesData
from finmlkit_tpu.data.store import (_keys_for_timerange, load_trades_h5,
                                     save_trades_h5)


def _sample(n=12, start="2021-01-15 00:00:00", freq="h"):
    idx = pd.date_range(start=start, periods=n, freq=freq)
    ts = idx.as_unit("ns").asi8  # ns ints (pandas 3 date_range defaults to us)
    px = np.linspace(100.0, 101.0, n).astype(np.float64)
    qty = np.linspace(1.0, 2.0, n).astype(np.float32)
    ids = np.arange(1, n + 1, dtype=np.int64)
    return ts, px, qty, ids, idx


@pytest.fixture
def store(tmp_path):
    """Three monthly groups: Jan (hourly), Feb, Mar 2021."""
    path = str(tmp_path / "trades.h5")
    for start in ("2021-01-15", "2021-02-10", "2021-03-05"):
        ts, px, qty, ids, idx = _sample(n=24, start=start)
        td = TradesData(ts, px, qty, ids, timestamp_unit="ns",
                        preprocess=False)
        td.save_h5(path)
    return path


class TestRangeFiltering:
    def test_inclusive_boundaries(self, store):
        ts, *_ , idx = _sample(n=24, start="2021-01-15")
        start, end = idx[3], idx[8]
        td = load_trades_h5(store, start_time=start, end_time=end)
        assert len(td.data) == 6  # rows 3..8 inclusive
        assert td.data["timestamp"].iloc[0] == int(start.value)
        assert td.data["timestamp"].iloc[-1] == int(end.value)

    def test_datetime_index_restored(self, store):
        td = load_trades_h5(store)
        assert isinstance(td.data.index, pd.DatetimeIndex)
        assert len(td.data) == 72  # three months x 24 rows

    def test_range_spanning_months(self, store):
        td = load_trades_h5(store, start_time="2021-01-20",
                            end_time="2021-02-28")
        ts = td.data["timestamp"].values
        lo = pd.Timestamp("2021-01-20").value
        hi = pd.Timestamp("2021-02-28").value
        assert (ts >= lo).all() and (ts <= hi).all()
        # Jan rows after the 20th are gone, Feb fully present
        assert len(td.data) == 24  # Feb only (Jan sample ends on the 16th)

    def test_start_only_and_end_only(self, store):
        td = load_trades_h5(store, start_time="2021-03-01")
        assert (td.data["timestamp"].values
                >= pd.Timestamp("2021-03-01").value).all()
        assert len(td.data) == 24
        td = load_trades_h5(store, end_time="2021-01-31")
        assert len(td.data) == 24

    def test_no_overlap_raises(self, store):
        with pytest.raises(ValueError, match="No monthly groups overlap"):
            load_trades_h5(store, start_time="2030-01-01",
                           end_time="2030-02-01")

    def test_key_selects_single_month(self, store):
        td = load_trades_h5(store, key="2021-02")
        assert len(td.data) == 24
        months = pd.to_datetime(td.data["timestamp"], unit="ns").dt.month
        assert (months == 2).all()

    def test_bad_key_raises(self, store):
        with pytest.raises(KeyError, match="not in store"):
            load_trades_h5(store, key="2022-09")

    def test_filter_within_single_selected_key(self, store):
        _, _, _, _, idx = _sample(n=24, start="2021-02-10")
        td = load_trades_h5(store, key="2021-02", start_time=idx[5],
                            end_time=idx[10])
        assert len(td.data) == 6


class TestKeyPruning:
    """Month-key pruning must not open groups outside the range."""

    def test_prunes_by_month(self):
        keys = ["2021-01", "2021-02", "2021-03", "2021-04"]
        lo = pd.Timestamp("2021-02-15").value
        hi = pd.Timestamp("2021-03-10").value
        assert _keys_for_timerange(keys, lo, hi) == ["2021-02", "2021-03"]

    def test_open_ended(self):
        keys = ["2021-01", "2021-02", "2021-03"]
        assert _keys_for_timerange(keys, None, None) == keys
        # boundary months are kept conservatively (rows masked later), so
        # use mid-month instants for the strict assertions
        lo = pd.Timestamp("2021-03-02").value
        assert _keys_for_timerange(keys, lo, None) == ["2021-03"]
        hi = pd.Timestamp("2021-01-30").value
        assert _keys_for_timerange(keys, None, hi) == ["2021-01"]

    def test_boundary_month_kept(self):
        keys = ["2021-01", "2021-02"]
        # a range starting on the last instant of Jan must keep Jan
        lo = pd.Timestamp("2021-01-31 23:59:59").value
        assert "2021-01" in _keys_for_timerange(keys, lo, None)


class TestWriterShim:
    def test_save_trades_h5_writes_meta(self, tmp_path):
        import h5py
        ts, px, qty, ids, idx = _sample(n=10, start="2021-05-01")
        td = TradesData(ts, px, qty, ids, timestamp_unit="ns",
                        preprocess=False)
        path = str(tmp_path / "w.h5")
        save_trades_h5(td, path, month_key="2021-05")
        with h5py.File(path, "r") as f:
            assert "trades/2021-05" in f
            assert int(f["meta/2021-05"].attrs["record_count"]) == 10
            assert int(f["meta/2021-05"].attrs["first_timestamp"]) == int(ts[0])


class TestLoadRobustness:
    """Multiprocess loading, sequential fallback, skipped groups
    (reference: data_model.py:689-732 — pool load with sequential
    fallback on failure, per-group errors skip the group)."""

    def test_multiprocess_load_matches_sequential(self, store):
        seq = load_trades_h5(store)
        par = load_trades_h5(store, enable_multiprocessing=True,
                             max_workers=2)
        pd.testing.assert_frame_equal(seq.data, par.data)

    def test_corrupt_group_skipped(self, store, tmp_path, monkeypatch):
        # one failing month must not sink the load: its group is skipped
        from finmlkit_tpu.data import store as store_mod
        orig = store_mod._load_single_group
        bad_key = sorted_months = None

        with h5py.File(store, "r") as f:
            months = sorted(f["trades"].keys())
        bad_key = months[0]

        def flaky(path, key):
            if key == bad_key:
                raise OSError("synthetic corruption")
            return orig(path, key)

        monkeypatch.setattr(store_mod, "_load_single_group", flaky)
        td = load_trades_h5(store)
        with h5py.File(store, "r") as f:
            good_len = sum(len(f[f"trades/{m}/timestamp"])
                           for m in months if m != bad_key)
        assert len(td.data) == good_len

    def test_all_groups_failing_raises(self, store, monkeypatch):
        from finmlkit_tpu.data import store as store_mod

        def always_fail(path, key):
            raise OSError("nope")

        monkeypatch.setattr(store_mod, "_load_single_group", always_fail)
        with pytest.raises(ValueError, match="All monthly group loads"):
            load_trades_h5(store)

    def test_missing_trades_root_raises(self, tmp_path):
        p = str(tmp_path / "empty.h5")
        with h5py.File(p, "w") as f:
            f.create_group("other")
        with pytest.raises(KeyError, match="trades"):
            load_trades_h5(p)

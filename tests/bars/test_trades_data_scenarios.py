"""Deep scenario matrix for the TradesData preprocessing pipeline.

Mirrors the reference's data-model test coverage
(/root/reference/tests/bars/test_data_model.py and the pipeline at
finmlkit/bar/data_model.py:121-418): timestamp-unit inference across
magnitudes, non-monotonic re-sorting, duplicate-id handling,
discontinuity records with missing-percentage, resolution rounding,
view ranges and input validation.
"""
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.bar import TradesData


def _mk(n=200, start_s=1_700_000_000, unit="ns", seed=0):
    r = np.random.default_rng(seed)
    scale = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[unit]
    ts = (start_s * scale + np.arange(n) * scale // 10).astype(np.int64)
    px = np.round(100 + np.cumsum(r.normal(0, 0.05, n)), 2)
    qty = (r.random(n) + 0.01).astype(np.float32)
    ids = np.arange(1000, 1000 + n, dtype=np.int64)
    return ts, px, qty, ids


class TestTimestampUnits:
    @pytest.mark.parametrize("unit", ["s", "ms", "us", "ns"])
    def test_inference_from_magnitude(self, unit):
        ts, px, qty, ids = _mk(unit=unit)
        td = TradesData(ts, px, qty, ids, preprocess=True)
        assert td.orig_timestamp_unit == unit
        # all units normalize to the same ns timeline
        assert int(td.data["timestamp"].iloc[0]) == 1_700_000_000 * 10 ** 9

    def test_explicit_unit_overrides_inference(self):
        ts, px, qty, ids = _mk(unit="ms")
        td = TradesData(ts, px, qty, ids, timestamp_unit="ms",
                        preprocess=True)
        assert td.orig_timestamp_unit == "ms"
        assert td.data["timestamp"].iloc[0] == 1_700_000_000 * 10 ** 9

    def test_invalid_unit_raises(self):
        ts, px, qty, ids = _mk()
        with pytest.raises(ValueError):
            TradesData(ts, px, qty, ids, timestamp_unit="fortnights",
                       preprocess=True)

    def test_datetime_index_matches_ns(self):
        ts, px, qty, ids = _mk()
        td = TradesData(ts, px, qty, ids, preprocess=True)
        assert isinstance(td.data.index, pd.DatetimeIndex)
        assert td.data.index[0] == pd.Timestamp(ts[0])


class TestSortingAndIds:
    def test_non_monotonic_input_resorted(self):
        # ids do NOT survive preprocessing (the split-merge rebuilds the
        # frame without them — reference data_model.py:338-344 does the
        # same), so assert on the time axis and the recovered prices
        ts, px, qty, ids = _mk()
        perm = np.random.default_rng(1).permutation(len(ts))
        td = TradesData(ts[perm], px[perm], qty[perm], ids[perm],
                        preprocess=True)
        out = td.data["timestamp"].values
        assert np.all(np.diff(out) >= 0)
        np.testing.assert_array_equal(td.data["price"].values, px)

    def test_duplicate_ids_dropped(self):
        ts, px, qty, ids = _mk(n=100)
        ts2 = np.concatenate([ts, ts[50:60]])
        px2 = np.concatenate([px, px[50:60]])
        qty2 = np.concatenate([qty, qty[50:60]])
        ids2 = np.concatenate([ids, ids[50:60]])
        td = TradesData(ts2, px2, qty2, ids2, preprocess=True)
        # the 10 repeated ids are dropped before merging
        assert len(td.data) <= 100
        np.testing.assert_array_equal(td.data["amount"].values, qty)

    def test_clean_stream_reports_ok(self):
        ts, px, qty, ids = _mk()
        td = TradesData(ts, px, qty, ids, preprocess=True)
        assert td.data_ok is True
        assert td.missing_pct == 0
        assert td.discontinuities == []


class TestIntegrityMetrics:
    def test_id_gap_missing_pct(self):
        ts, px, qty, ids = _mk(n=200)
        keep = np.ones(200, bool)
        keep[80:100] = False  # drop 20 trades -> id gap of 20
        td = TradesData(ts[keep], px[keep], qty[keep], ids[keep],
                        preprocess=True)
        assert td.missing_pct > 0
        np.testing.assert_allclose(td.missing_pct, 20 / 180 * 100, rtol=0.2)

    def test_large_time_gap_recorded(self):
        ts, px, qty, ids = _mk(n=100)
        ts = ts.copy()
        ts[50:] += 10 * 60 * 10 ** 9  # 10-minute hole with an id gap
        ids = ids.copy()
        ids[50:] += 500
        td = TradesData(ts, px, qty, ids, preprocess=True)
        assert td.data_ok is False or len(td.discontinuities) > 0

    def test_preprocess_requires_ids(self):
        ts, px, qty, _ = _mk()
        with pytest.raises(ValueError):
            TradesData(ts, px, qty, None, preprocess=True)

    def test_type_validation(self):
        ts, px, qty, ids = _mk()
        with pytest.raises(TypeError):
            TradesData(list(ts), px, qty, ids)
        with pytest.raises(TypeError):
            TradesData(ts, px, qty, list(ids))


class TestResolutionRounding:
    def test_resolution_rounds_timestamps(self):
        ts, px, qty, ids = _mk()
        td = TradesData(ts, px, qty, ids, preprocess=True, proc_res="ms")
        assert np.all(td.data["timestamp"].values % 1_000_000 == 0)

    def test_invalid_resolution_raises(self):
        ts, px, qty, ids = _mk()
        with pytest.raises(ValueError):
            TradesData(ts, px, qty, ids, preprocess=True, proc_res="parsec")

    def test_no_resolution_keeps_ns(self):
        ts, px, qty, ids = _mk()
        td = TradesData(ts, px, qty, ids, preprocess=True)
        np.testing.assert_array_equal(
            np.sort(td.data["timestamp"].values % 1_000_000 == 0),
            np.sort((ts % 1_000_000) == 0))


class TestSides:
    def test_maker_flag_sets_sides(self):
        ts, px, qty, ids = _mk(n=50)
        maker = np.zeros(50, bool)
        maker[::2] = True  # maker True -> aggressive sell -> side -1
        td = TradesData(ts, px, qty, ids, is_buyer_maker=maker,
                        preprocess=True)
        s = td.data["side"].values
        assert set(np.unique(s)).issubset({-1, 1})

    def test_tick_rule_carry_forward(self):
        ts, _, qty, ids = _mk(n=6)
        px = np.array([100.0, 100.5, 100.5, 100.2, 100.2, 100.9])
        td = TradesData(ts, px, qty, ids, preprocess=True)
        s = td.data["side"].values
        # up-tick -> +1, flat carries, down-tick -> -1
        np.testing.assert_array_equal(s[1:], [1, 1, -1, -1, 1])

    def test_explicit_side_kept_without_preprocess(self):
        # preprocessing rebuilds the frame in the split-merge (reference
        # semantics) and re-derives sides; WITHOUT preprocessing an
        # explicit side column is kept verbatim
        ts, px, qty, ids = _mk(n=20)
        side = np.ones(20, np.int8)
        td = TradesData(ts, px, qty, ids, side=side)
        np.testing.assert_array_equal(td.data["side"].values, 1)


class TestViewRange:
    def test_view_range_filters_data(self):
        ts, px, qty, ids = _mk(n=100)
        td = TradesData(ts, px, qty, ids, preprocess=True)
        mid = pd.Timestamp(ts[30])
        end = pd.Timestamp(ts[60])
        td.set_view_range(mid, end)
        assert len(td.data) < 100
        assert td.data.index.min() >= mid

    def test_invalid_range_raises(self):
        ts, px, qty, ids = _mk(n=10)
        td = TradesData(ts, px, qty, ids, preprocess=True)
        with pytest.raises(ValueError):
            td.set_view_range(pd.Timestamp(ts[5]), pd.Timestamp(ts[2]))

"""TBMLabel / SampleWeights wrapper-layer tests.

Mirrors the reference's tests/labels/test_label_kit.py coverage
(semantics, not code): constructor validation matrix, feature
preprocessing (leading-NaN trim, min-return filter), trailing-event
drop at the vertical barrier, output-frame shape/columns, property
guards, weight-frame composition and final-weight normalization.
"""
import numpy as np
import pandas as pd
import pytest

from finmlkit_tpu.bar import TradesData
from finmlkit_tpu.label import TBMLabel, SampleWeights


def _trades(n=20_000, seed=0):
    r = np.random.default_rng(seed)
    dt = (r.exponential(100.0, n) * 1e6).astype(np.int64)
    ts = 1_700_000_000_000_000_000 + np.cumsum(dt)
    px = np.round(100 * np.exp(np.cumsum(r.normal(0, 2e-4, n))), 2)
    amt = (r.random(n) + 0.01).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    return TradesData(ts, px, amt, ids, timestamp_unit="ns",
                      preprocess=True)


def _features(trades, every=500, tgt=0.002):
    df = trades.data.iloc[::every][["price"]].copy()
    df["tgt"] = tgt
    return df


@pytest.fixture(scope="module")
def trades():
    return _trades()


@pytest.fixture
def feats(trades):
    return _features(trades)


def _mk(feats, **kw):
    args = dict(target_ret_col="tgt", min_ret=0.0,
                horizontal_barriers=(1.0, 1.0),
                vertical_barrier=pd.Timedelta(minutes=30))
    args.update(kw)
    return TBMLabel(feats, **args)


class TestValidation:
    def test_missing_target_column(self, feats):
        with pytest.raises(ValueError, match="Target column"):
            _mk(feats, target_ret_col="nope")

    def test_non_datetime_index(self, feats):
        bad = feats.reset_index(drop=True)
        with pytest.raises(ValueError, match="DatetimeIndex"):
            _mk(bad)

    def test_bad_barriers(self, feats):
        with pytest.raises(ValueError, match="Horizontal barriers"):
            _mk(feats, horizontal_barriers=(1.0,))
        with pytest.raises(ValueError, match="Horizontal barriers"):
            _mk(feats, horizontal_barriers=[1.0, 1.0])

    def test_negative_min_ret(self, feats):
        with pytest.raises(ValueError, match="non-negative"):
            _mk(feats, min_ret=-0.1)

    def test_meta_requires_side(self, feats):
        with pytest.raises(ValueError, match="side"):
            _mk(feats, is_meta=True)

    def test_meta_side_must_be_integer(self, feats):
        f = feats.copy()
        f["side"] = 1.5
        with pytest.raises(ValueError, match="integer"):
            _mk(f, is_meta=True)

    def test_all_nan_features_rejected(self):
        idx = pd.date_range("2024-01-01", periods=5, freq="1min")
        f = pd.DataFrame({"tgt": [np.nan] * 5}, index=idx)
        with pytest.raises(ValueError):
            _mk(f)

    def test_nan_target_rows_filtered(self, feats):
        # NaN targets fail the min-return comparison and are silently
        # dropped by the event filter (reference kit.py:154-178 does the
        # same: NaN comparisons are False)
        f = feats.copy()
        f.iloc[10, f.columns.get_loc("tgt")] = np.nan
        kit = _mk(f)
        assert kit.event_count == len(f) - 1

    def test_compute_labels_requires_trades(self, feats):
        kit = _mk(feats)
        with pytest.raises(ValueError, match="TradesData"):
            kit.compute_labels(feats)


class TestPreprocessing:
    def test_leading_nans_trimmed(self, trades, feats):
        f = feats.copy()
        f["extra"] = np.concatenate([[np.nan] * 3,
                                     np.ones(len(f) - 3)])
        kit = _mk(f)
        assert kit.event_count == len(f) - 3
        assert kit.first_event_timestamp == f.index[3]

    def test_min_ret_filters_small_targets(self, feats):
        f = feats.copy()
        half = len(f) // 2
        f.iloc[:half, f.columns.get_loc("tgt")] = 1e-6  # below min_ret
        kit = _mk(f, min_ret=0.001)
        assert kit.event_count == len(f) - half

    def test_barrier_multiplier_scales_filter(self, feats):
        f = feats.copy()
        f["tgt"] = 0.0006
        # max(mult)=2 -> 0.0012 >= min_ret -> kept
        kit = _mk(f, min_ret=0.001, horizontal_barriers=(1.0, 2.0))
        assert kit.event_count == len(f)
        with pytest.raises(ValueError, match="No valid events"):
            _mk(f, min_ret=0.002, horizontal_barriers=(1.0, 1.0))

    def test_event_range_string(self, feats):
        kit = _mk(feats)
        assert str(kit.event_count) in kit.event_range


class TestComputeLabels:
    def test_output_frame_contract(self, trades, feats):
        kit = _mk(feats)
        used, out = kit.compute_labels(trades)
        assert {"touch_time", "event_idx", "touch_idx", "labels",
                "returns", "vertical_touch_weights"} <= set(out.columns)
        assert out.index.equals(used.index)
        assert set(np.unique(out["labels"])) <= {-1, 1}
        # touches never precede events and never pass the vertical cap
        assert (out["touch_idx"] >= out["event_idx"]).all()
        horizon = (out["touch_time"] - out.index).dt.total_seconds()
        assert (horizon <= 30 * 60 + 1).all()

    def test_trailing_events_dropped(self, trades, feats):
        kit = _mk(feats, vertical_barrier=pd.Timedelta(minutes=10))
        used, out = kit.compute_labels(trades)
        last_ts = pd.Timestamp(trades.data["timestamp"].values[-1])
        assert (used.index + pd.Timedelta(minutes=10) <= last_ts).all()
        assert kit.event_count < len(feats)

    def test_property_guards_before_compute(self, feats):
        kit = _mk(feats)
        with pytest.raises(ValueError, match="compute_labels"):
            kit.labels
        with pytest.raises(ValueError, match="compute_labels"):
            kit.event_returns
        with pytest.raises(ValueError):
            kit.full_output

    def test_meta_labels_binary(self, trades, feats):
        f = feats.copy()
        f["side"] = np.where(np.arange(len(f)) % 2 == 0, 1, -1)
        kit = _mk(f, is_meta=True, min_ret=0.0005)
        _, out = kit.compute_labels(trades)
        assert set(np.unique(out["labels"])) <= {0, 1}

    def test_vertical_touch_weights_in_unit_interval(self, trades, feats):
        kit = _mk(feats)
        _, out = kit.compute_labels(trades)
        w = out["vertical_touch_weights"].values
        assert np.all(w >= 0.0) and np.all(w <= 1.0 + 1e-9)


class TestWeights:
    @pytest.fixture
    def labeled(self, trades, feats):
        kit = _mk(feats)
        kit.compute_labels(trades)
        return kit

    def test_info_weights_frame(self, trades, labeled):
        w = labeled.compute_weights(trades)
        assert {"avg_uniqueness", "return_attribution"} <= set(w.columns)
        assert w.index.equals(labeled.full_output.index)
        u = w["avg_uniqueness"].values
        assert np.all(u > 0) and np.all(u <= 1.0 + 1e-12)

    def test_info_weights_validation(self, trades, labeled):
        with pytest.raises(ValueError, match="TradesData"):
            SampleWeights.compute_info_weights("nope", labeled.full_output)
        with pytest.raises(ValueError, match="event_idx"):
            SampleWeights.compute_info_weights(
                trades, pd.DataFrame({"x": [1]}))

    def test_final_weights_mean_one(self, trades, labeled):
        w = labeled.compute_weights(trades)
        out = SampleWeights.compute_final_weights(
            w["avg_uniqueness"], time_decay_intercept=0.5,
            return_attribution=w["return_attribution"],
            vertical_touch_weights=labeled.full_output[
                "vertical_touch_weights"],
            labels=labeled.labels)
        assert "weights" in out.columns
        # class balancing redistributes but the pre-balance base is
        # normalized to mean 1; the final stays the same order
        assert 0.5 < out["weights"].mean() < 2.0

    def test_final_weights_index_mismatch_raises(self, labeled, trades):
        w = labeled.compute_weights(trades)
        shifted = w["return_attribution"].iloc[1:]
        with pytest.raises(ValueError, match="same index"):
            SampleWeights.compute_final_weights(
                w["avg_uniqueness"], return_attribution=shifted)

    def test_final_weights_intercept_bounds(self, labeled, trades):
        w = labeled.compute_weights(trades)
        with pytest.raises(ValueError, match=r"\[-1, 1\]"):
            SampleWeights.compute_final_weights(
                w["avg_uniqueness"], time_decay_intercept=1.5)

    def test_uniqueness_only_composition(self, labeled, trades):
        w = labeled.compute_weights(trades)
        out = SampleWeights.compute_final_weights(w["avg_uniqueness"])
        assert np.all(out["weights"].values >= 0)
        np.testing.assert_allclose(out["weights"].mean(), 1.0, rtol=1e-9)

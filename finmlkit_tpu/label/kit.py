"""User-facing labeling API: TBMLabel + SampleWeights.

Parity: /root/reference/finmlkit/label/kit.py — same preprocessing
(leading-NaN trim, min-return filter at kit.py:154-178), trailing-event
drop (:262-269), event-index derivation via searchsorted (:286-288),
output frame columns (:303-311), and final-weight combination
(:379-477). The numeric kernels are the TPU programs in
``finmlkit_tpu.label.tbm`` / ``finmlkit_tpu.label.weights``.
"""
import numpy as np
import pandas as pd

from ..bar.data_model import TradesData
from ..utils.log import get_logger
from .tbm import triple_barrier
from .weights import (
    average_uniqueness,
    class_balance_weights,
    return_attribution,
    time_decay,
)

logger = get_logger(__name__)


class TBMLabel:
    """Triple-Barrier Method labeling wrapper (see module docstring)."""

    def __init__(self, features: pd.DataFrame, target_ret_col: str,
                 min_ret: float, horizontal_barriers: tuple,
                 vertical_barrier: pd.Timedelta,
                 min_close_time: pd.Timedelta = pd.Timedelta(seconds=1),
                 is_meta: bool = False):
        if target_ret_col not in features.columns:
            raise ValueError(f"Target column '{target_ret_col}' not found in features DataFrame.")
        if not isinstance(features.index, pd.DatetimeIndex):
            raise ValueError("Features index must be a DatetimeIndex.")
        if not isinstance(horizontal_barriers, tuple) or len(horizontal_barriers) != 2:
            raise ValueError("Horizontal barriers must be a tuple of two floats (bottom, top).")
        if min_ret < 0.0:
            raise ValueError("Minimum return must be non-negative.")
        if is_meta:
            if "side" not in features.columns:
                raise ValueError("For meta labeling, 'side' column must be present in features DataFrame.")
            if not pd.api.types.is_integer_dtype(features["side"]):
                raise ValueError("The 'side' column must be of integer type (e.g., -1, 0, 1).")

        self._orig_features = self._preprocess_features(
            features, target_ret_col, min_ret, horizontal_barriers)
        self._features = self._orig_features
        self.target_ret_col = target_ret_col
        self.min_ret = min_ret
        self.horizontal_barriers = horizontal_barriers
        self.vertical_barrier = vertical_barrier.total_seconds()
        self.min_close_time_sec = min_close_time.total_seconds()
        self.is_meta = is_meta
        self._out = None

    @staticmethod
    def _preprocess_features(x, target_ret_col, min_ret, horizontal_barriers):
        first_valid = [x[c].first_valid_index() for c in x.columns
                       if x[c].first_valid_index() is not None]
        if not first_valid:
            raise ValueError("All columns contain only NaN values.")
        x = x.loc[max(first_valid):]
        max_mult = np.max(horizontal_barriers)
        x = x[x[target_ret_col].abs() * max_mult >= min_ret]
        if x.empty:
            raise ValueError("No valid events found after filtering by minimum return and removing leading NaNs.")
        if x[target_ret_col].isna().any():
            raise ValueError(f"Target return column '{target_ret_col}' contains NaN values.")
        return x

    # ------------------------------------------------------------------
    @property
    def event_count(self) -> int:
        return len(self._features)

    @property
    def first_event_timestamp(self):
        return self._features.index[0] if not self._features.empty else None

    @property
    def last_event_timestamp(self):
        return self._features.index[-1] if not self._features.empty else None

    @property
    def event_range(self) -> str:
        return (f"From {self.first_event_timestamp} to {self.last_event_timestamp} "
                f"({self.event_count} events)")

    @property
    def features(self) -> pd.DataFrame:
        return self._features

    @property
    def target_returns(self) -> pd.Series:
        return self._features[self.target_ret_col]

    @property
    def labels(self) -> pd.Series:
        if self._out is None:
            raise ValueError("Labels have not been computed yet. Call `compute_labels()` first.")
        return self._out["labels"]

    @property
    def event_returns(self) -> pd.Series:
        if self._out is None or "returns" not in self._out.columns:
            raise ValueError("Log returns have not been computed yet. Call `compute_labels()` first.")
        return self._out["returns"]

    @property
    def full_output(self) -> pd.DataFrame:
        if self._out is None:
            raise ValueError("Labels have not been computed yet.")
        return self._out

    # ------------------------------------------------------------------
    def _drop_trailing_events(self, trades: TradesData) -> pd.DataFrame:
        last_ts = pd.Timestamp(trades.data.timestamp.values[-1], unit="ns")
        keep = (self._orig_features.index
                + pd.Timedelta(self.vertical_barrier, unit="s")) <= last_ts
        return self._orig_features[keep]

    def compute_labels(self, trades: TradesData):
        if not isinstance(trades, TradesData):
            raise ValueError("Trades must be an instance of TradesData.")
        self._features = self._drop_trailing_events(trades)

        if "event_idx" in self._features.columns:
            event_idx = self._features.event_idx.values
        else:
            event_idx = np.searchsorted(
                trades.data.timestamp.values,
                self._features.index.values.astype(np.int64))

        labels, touch_idx, rets, max_rb_ratios = triple_barrier(
            timestamps=trades.data.timestamp.values,
            close=trades.data.price.values,
            event_idxs=event_idx,
            targets=self.target_returns.values,
            horizontal_barriers=self.horizontal_barriers,
            vertical_barrier=self.vertical_barrier,
            min_close_time_sec=self.min_close_time_sec,
            side=self._features["side"].values.astype(np.int8) if self.is_meta else None,
            min_ret=self.min_ret,
        )
        labels = np.asarray(labels)
        touch_idx = np.asarray(touch_idx)

        self._out = pd.DataFrame({
            "touch_time": pd.to_datetime(trades.data.timestamp.values[touch_idx]),
            "event_idx": event_idx,
            "touch_idx": touch_idx,
            "labels": labels,
            "returns": np.asarray(rets),
            "vertical_touch_weights": np.asarray(max_rb_ratios),
        }, index=self._features.index)
        return self._features, self.full_output

    def compute_weights(self, trades: TradesData, normalized: bool = False) -> pd.DataFrame:
        return SampleWeights.compute_info_weights(trades, self._out, normalized)


class SampleWeights:
    """Time-decay / class-balance weight composition (kit.py:325-477)."""

    @staticmethod
    def compute_info_weights(trades: TradesData, labels: pd.DataFrame,
                             normalize: bool = False) -> pd.DataFrame:
        if not isinstance(trades, TradesData):
            raise ValueError("Trades must be an instance of TradesData.")
        if not isinstance(labels, pd.DataFrame):
            raise ValueError("Events must be a pandas DataFrame.")
        if "event_idx" not in labels.columns or "touch_idx" not in labels.columns:
            raise ValueError("Events DataFrame must contain 'event_idx' and 'touch_idx' columns.")

        avg_u, concurrency = average_uniqueness(
            timestamps=trades.data.timestamp.values,
            event_idxs=labels.event_idx.values,
            touch_idxs=labels.touch_idx.values,
        )
        out_df = pd.DataFrame({"avg_uniqueness": np.asarray(avg_u)}, index=labels.index)
        info_w = return_attribution(
            event_idxs=labels.event_idx.values,
            touch_idxs=labels.touch_idx.values,
            close=trades.data.price.values,
            concurrency=concurrency,
            normalize=normalize,
        )
        out_df["return_attribution"] = np.asarray(info_w)
        return out_df

    @staticmethod
    def compute_final_weights(avg_uniqueness: pd.Series,
                              time_decay_intercept: float = 1.0,
                              return_attribution: pd.Series = None,
                              vertical_touch_weights: pd.Series = None,
                              labels: pd.Series = None) -> pd.DataFrame:
        if not isinstance(avg_uniqueness, pd.Series):
            raise ValueError("avg_uniqueness must be a pandas Series.")
        if not isinstance(time_decay_intercept, (int, float)):
            raise ValueError("time_decay_intercept must be a numeric value.")
        if not -1.0 <= time_decay_intercept <= 1.0:
            raise ValueError("time_decay_intercept must lie in [-1, 1]")
        for s, nm in ((return_attribution, "return_attribution"),
                      (vertical_touch_weights, "vertical_touch_weights"),
                      (labels, "labels")):
            if s is not None:
                if not isinstance(s, pd.Series):
                    raise ValueError(f"{nm} must be a pandas Series.")
                if not avg_uniqueness.index.equals(s.index):
                    raise ValueError(f"avg_uniqueness and {nm} must have the same index.")

        n_events = len(avg_uniqueness)
        tdw = np.asarray(time_decay(avg_uniqueness.values, time_decay_intercept))
        out_df = pd.DataFrame({"time_decay_weights": tdw}, index=avg_uniqueness.index)

        if return_attribution is not None:
            if return_attribution.sum() <= 0:
                raise ValueError("Return attribution sum is zero or negative, cannot normalize.")
            ra = return_attribution.values * n_events / return_attribution.sum()
            out_df["return_attribution"] = ra
            combined = tdw * ra
        else:
            combined = tdw * avg_uniqueness.values

        if vertical_touch_weights is not None:
            out_df["vertical_touch_weights"] = vertical_touch_weights.values
            combined = combined * vertical_touch_weights.values

        mean_w = combined.mean()
        if mean_w <= 0:
            raise ValueError("Mean of combined weights is zero or negative, cannot normalize.")
        base_weights = combined / mean_w

        if labels is not None:
            _, _, _, final_weights = class_balance_weights(labels.values, base_weights)
            final_weights = np.asarray(final_weights)
        else:
            final_weights = base_weights
        out_df["weights"] = final_weights
        return out_df

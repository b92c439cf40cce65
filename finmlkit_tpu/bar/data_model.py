"""Trade data model: preprocessing pipeline + footprint container.

Parity: /root/reference/finmlkit/bar/data_model.py (TradesData :121-418,
FootprintData :775-1058). The preprocessing pipeline (ns conversion, sort
by id, duplicate drop, gap detection, split-trade merging, tick-rule side
inference) is host-side data engineering; the sequential Numba loops of
the reference are replaced by vectorized NumPy group operations:

- ``merge_split_trades`` (bar/utils.py:263-329) -> adjacent-boundary
  grouping + ``np.add.reduceat`` (sequential within-group f32 adds, same
  accumulation order as the reference loop)
- ``comp_trade_side_vector`` (bar/utils.py:26-46) -> sign of price change
  with forward-fill of the last nonzero sign (cummax gather)

The footprint container stores *dense* ``(n_bars, max_levels)`` tensors
with per-bar ``(low_level, n_levels)`` offsets instead of the reference's
ragged NumbaLists (its own TODO at bar/base.py:661 points this way) —
dense tensors are what the TPU wants.
"""
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd

from ..utils.log import get_logger
# canonical implementations live in bar/utils.py (the reference's
# module home, /root/reference/finmlkit/bar/utils.py); re-exported
# here for backward-compatible import paths
from .utils import (  # noqa: F401
    comp_price_tick_size,
    comp_trade_side_vector,
    merge_split_trades,
)

logger = get_logger(__name__)

_UNIT_SCALE = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}


class TradesData:
    """Raw-trades container with the reference's preprocessing pipeline.

    Parity: /root/reference/finmlkit/bar/data_model.py:121-418. Holds a
    pandas DataFrame with columns timestamp (ns int64), price (f64),
    amount (f32), optional side (int8), datetime index; tracks integrity
    metrics (missing_pct, discontinuities) from trade-id gap analysis.
    """

    def __init__(self, ts, px, qty, id=None, *, is_buyer_maker=None, side=None,
                 dt_index=None, timestamp_unit: Optional[str] = None,
                 preprocess: bool = False, proc_res: Optional[str] = None,
                 name=None):
        for arr, label in ((ts, "ts"), (px, "px"), (qty, "qty")):
            if not isinstance(arr, np.ndarray):
                raise TypeError(f"{label} must be a np.ndarray")
        if id is not None and not isinstance(id, np.ndarray):
            raise TypeError("id must be a np.ndarray")

        self._start_date = self._end_date = None
        self._data = pd.DataFrame({"timestamp": ts, "price": px, "amount": qty, "id": id})
        self.is_buyer_maker = is_buyer_maker
        if side is not None:
            self._data["side"] = side
        self._orig_timestamp_unit = timestamp_unit or self._infer_timestamp_unit()
        self.name = name

        self.missing_pct = 0
        self.data_ok = None
        self.discontinuities = []
        if preprocess:
            if id is None:
                raise ValueError("id is required if preprocess is True")
            self._convert_timestamps_to_ns()
            self._sort_trades()
            self._merge_trades()
            self._apply_timestamp_resolution(proc_res)
            if "side" not in self._data.columns:
                self._add_trade_side_info()

        if dt_index is not None:
            self._data.set_index(dt_index, inplace=True)
        else:
            self._data.set_index(
                pd.to_datetime(self._data["timestamp"], unit="ns"), inplace=True
            )
            self._data.index.name = "datetime"

    # ------------------------------------------------------------------
    @property
    def data(self) -> pd.DataFrame:
        if self._start_date is None and self._end_date is None:
            return self._data
        return self._data.loc[self._start_date:self._end_date]

    @property
    def start_date(self):
        return self._start_date

    @property
    def end_date(self):
        return self._end_date

    @property
    def orig_timestamp_unit(self) -> str:
        return self._orig_timestamp_unit

    def set_view_range(self, start, end):
        start = pd.Timestamp(start) if isinstance(start, str) else start
        end = pd.Timestamp(end) if isinstance(end, str) else end
        if start >= end:
            raise ValueError("Start timestamp must be before end timestamp.")
        self._start_date, self._end_date = start, end

    # ------------------------------------------------------------------
    def _infer_timestamp_unit(self) -> str:
        max_ts = self._data["timestamp"].max()
        if max_ts > 1e18:
            return "ns"
        if max_ts > 1e15:
            return "us"
        if max_ts > 1e12:
            return "ms"
        logger.warning("Timestamp unit is set to seconds. Please verify the data.")
        return "s"

    def _convert_timestamps_to_ns(self):
        if self.orig_timestamp_unit not in _UNIT_SCALE:
            raise ValueError(
                f"Invalid timestamp format! Must be one of: {', '.join(_UNIT_SCALE)}"
            )
        factor = _UNIT_SCALE[self.orig_timestamp_unit]
        self._data["timestamp"] = np.multiply(
            self._data["timestamp"].values, factor, dtype=np.int64
        )

    def _sort_trades(self):
        self.data_ok = True
        self.discontinuities = []
        self._data.sort_values(by=["id"], inplace=True)
        self._data.reset_index(drop=True, inplace=True)
        if self._data["id"].duplicated().any():
            logger.warning(f"{self.name} | Trade IDs contain duplicates.")
            self._data.drop_duplicates(subset="id", keep="first", inplace=True)
            self.data_ok = False
        self._validate_data()
        if not self._data.timestamp.is_monotonic_increasing:
            logger.warning(f"{self.name} | timestamps non-monotonic after id sort.")
            self._data.sort_values(by=["timestamp", "id"], inplace=True)
        self._data.reset_index(drop=True, inplace=True)

    def _validate_data(self):
        """Trade-id gap scan; records >1min discontinuities and missing %.

        Parity: data_model.py:254-292.
        """
        ids = self._data["id"].values
        id_diffs = np.diff(ids)
        gap_indices = np.flatnonzero(id_diffs > 1)
        if len(gap_indices) == 0:
            return
        logger.warning(
            f"{self.name} | Found {len(gap_indices):,} discontinuities in trade IDs."
        )
        ts = self._data["timestamp"].values
        gap_sizes = ids[gap_indices + 1] - ids[gap_indices] - 1
        pre_t = pd.to_datetime(ts[gap_indices], unit="ns")
        post_t = pd.to_datetime(ts[gap_indices + 1], unit="ns")
        tdiff = post_t - pre_t
        large = tdiff > pd.Timedelta(minutes=1)
        if large.any():
            self.data_ok = False
            for k in np.flatnonzero(np.asarray(large)):
                i = gap_indices[k]
                self.discontinuities.append({
                    "start_id": int(ids[i]),
                    "end_id": int(ids[i + 1]),
                    "missing_ids": int(gap_sizes[k]),
                    "pre_gap_time": pre_t[k],
                    "post_gap_time": post_t[k],
                    "time_interval": tdiff[k],
                })
        self.missing_pct = float(gap_sizes.sum()) / len(self._data) * 100

    def _merge_trades(self):
        ts, px, am, side = merge_split_trades(
            self._data["timestamp"].values.astype(np.int64),
            self._data["price"].values.astype(np.float64),
            self._data["amount"].values.astype(np.float32),
            self.is_buyer_maker,
        )
        self._data = pd.DataFrame({"timestamp": ts, "price": px, "amount": am})
        if self.is_buyer_maker is not None:
            self._data["side"] = side

    def _apply_timestamp_resolution(self, proc_res):
        if proc_res and proc_res != self.orig_timestamp_unit:
            if proc_res not in _UNIT_SCALE:
                raise ValueError(f"Invalid processing resolution: {proc_res}.")
            res = _UNIT_SCALE[proc_res]
            self._data["timestamp"] = (self._data["timestamp"] // res) * res

    def _add_trade_side_info(self):
        self._data["side"] = comp_trade_side_vector(self._data["price"].values)

    # --- persistence (see finmlkit_tpu.data.store) --------------------
    def save_h5(self, filepath: str, **kwargs) -> str:
        from ..data.store import save_trades_h5
        return save_trades_h5(self, filepath, **kwargs)

    @classmethod
    def load_trades_h5(cls, filepath: str, **kwargs) -> "TradesData":
        from ..data.store import load_trades_h5
        return load_trades_h5(filepath, **kwargs)


@dataclass
class FootprintData:
    """Dense per-bar/per-price-level order-flow container.

    Parity: /root/reference/finmlkit/bar/data_model.py:775-1058, stored
    dense: ``(n_bars, max_levels)`` tensors masked by per-bar
    ``n_levels``, with ``low_level`` giving the integer tick of level 0.
    """

    bar_timestamps: np.ndarray          # (n_bars,) int64 ns
    price_tick: float
    low_level: np.ndarray               # (n_bars,) int32
    n_levels: np.ndarray                # (n_bars,) int32
    buy_volumes: np.ndarray             # (n_bars, L) f32
    sell_volumes: np.ndarray            # (n_bars, L) f32
    buy_ticks: np.ndarray               # (n_bars, L) i32
    sell_ticks: np.ndarray              # (n_bars, L) i32
    buy_imbalances: np.ndarray          # (n_bars, L) bool
    sell_imbalances: np.ndarray         # (n_bars, L) bool
    buy_imbalances_sum: np.ndarray      # (n_bars,) u16
    sell_imbalances_sum: np.ndarray     # (n_bars,) u16
    cot_price_levels: np.ndarray        # (n_bars,) i32
    imb_max_run_signed: np.ndarray      # (n_bars,) i16
    vp_skew: np.ndarray                 # (n_bars,) f64
    vp_gini: np.ndarray                 # (n_bars,) f64
    extras: dict = field(default_factory=dict)

    def __len__(self):
        return len(self.bar_timestamps)

    @property
    def price_levels(self):
        """Ragged list view of per-bar integer price levels (host export)."""
        return [
            np.arange(self.low_level[i], self.low_level[i] + self.n_levels[i],
                      dtype=np.int32)
            for i in range(len(self))
        ]

    def _ragged(self, dense):
        return [dense[i, : self.n_levels[i]] for i in range(len(self))]

    def __getitem__(self, key):
        """Datetime / integer slicing over bars (returns a FootprintData view)."""
        if isinstance(key, slice) and (
            isinstance(key.start, (str, pd.Timestamp)) or
            isinstance(key.stop, (str, pd.Timestamp))
        ):
            ts = pd.to_datetime(self.bar_timestamps)
            start = pd.Timestamp(key.start) if key.start is not None else ts[0]
            stop = pd.Timestamp(key.stop) if key.stop is not None else ts[-1]
            mask = (ts >= start) & (ts <= stop)
            idx = np.flatnonzero(np.asarray(mask))
            if len(idx) == 0:
                key = slice(0, 0)
            else:
                key = slice(int(idx[0]), int(idx[-1]) + 1)
        return FootprintData(
            bar_timestamps=self.bar_timestamps[key],
            price_tick=self.price_tick,
            low_level=self.low_level[key],
            n_levels=self.n_levels[key],
            buy_volumes=self.buy_volumes[key],
            sell_volumes=self.sell_volumes[key],
            buy_ticks=self.buy_ticks[key],
            sell_ticks=self.sell_ticks[key],
            buy_imbalances=self.buy_imbalances[key],
            sell_imbalances=self.sell_imbalances[key],
            buy_imbalances_sum=self.buy_imbalances_sum[key],
            sell_imbalances_sum=self.sell_imbalances_sum[key],
            cot_price_levels=self.cot_price_levels[key],
            imb_max_run_signed=self.imb_max_run_signed[key],
            vp_skew=self.vp_skew[key],
            vp_gini=self.vp_gini[key],
        )

    def get_df(self) -> pd.DataFrame:
        """Flatten to a MultiIndex (bar_idx, bar_datetime) DataFrame.

        Parity: /root/reference/finmlkit/bar/utils.py:129-209
        (footprint_to_dataframe), price levels scaled back to price units,
        descending price order within each bar.
        """
        nl = self.n_levels.astype(np.int64)
        bar_idx = np.repeat(np.arange(len(self)), nl)
        bar_dt = pd.to_datetime(np.repeat(self.bar_timestamps, nl))
        level_in_bar = np.concatenate([np.arange(k, dtype=np.int64) for k in nl]) \
            if len(self) else np.empty(0, dtype=np.int64)
        flat = bar_idx * self.buy_volumes.shape[1] + level_in_bar
        price_level = (np.repeat(self.low_level, nl) + level_in_bar) * self.price_tick
        df = pd.DataFrame({
            "price_level": price_level,
            "sell_ticks": self.sell_ticks.reshape(-1)[flat],
            "buy_ticks": self.buy_ticks.reshape(-1)[flat],
            "sell_volume": self.sell_volumes.reshape(-1)[flat],
            "buy_volume": self.buy_volumes.reshape(-1)[flat],
            "sell_imbalance": self.sell_imbalances.reshape(-1)[flat],
            "buy_imbalance": self.buy_imbalances.reshape(-1)[flat],
        }, index=pd.MultiIndex.from_arrays([bar_idx, bar_dt],
                                           names=["bar_idx", "bar_datetime_idx"]))
        return df.sort_values(by=["bar_datetime_idx", "price_level"],
                              ascending=[True, False])

    def cast_to_numba_list(self):
        """No-op compatibility shim: the reference converts to ragged
        NumbaLists before kernel calls (data_model.py:994); the dense
        tensors here are already kernel-ready."""
        return self

    @property
    def buy_volumes_ragged(self):
        return self._ragged(self.buy_volumes)

    @property
    def sell_volumes_ragged(self):
        return self._ragged(self.sell_volumes)

    def memory_usage(self) -> int:
        """Total bytes of the dense tensors."""
        return sum(
            a.nbytes for a in (
                self.bar_timestamps, self.low_level, self.n_levels,
                self.buy_volumes, self.sell_volumes, self.buy_ticks,
                self.sell_ticks, self.buy_imbalances, self.sell_imbalances,
                self.buy_imbalances_sum, self.sell_imbalances_sum,
                self.cot_price_levels, self.imb_max_run_signed,
                self.vp_skew, self.vp_gini,
            )
        )

"""1-second kline construction and timeframe-resampling reader.

Parity: /root/reference/finmlkit/bar/io.py — ``AddTimeBarH5``
(:441-565) builds 1-second OHLCV time bars per monthly partition and
persists them under ``/klines/YYYY-MM`` (+ ``/klines_meta/``);
``TimeBarReader`` (:568-950) provides metadata-driven range reads and
mathematically correct resampling to arbitrary timeframes
(volume-weighted VWAP, volume-weighted median of per-second medians).
The bar construction runs on the TPU via TimeBarKit.
"""
import datetime as dt
from typing import Dict, List, Optional, Union

import h5py
import numpy as np
import pandas as pd

from ..utils.log import get_logger

logger = get_logger(__name__)

_KLINE_COLS = ("open", "high", "low", "close", "volume", "trades",
               "median_trade_size", "vwap")


class AddTimeBarH5:
    """Build and persist 1-second time bars for each monthly partition."""

    def __init__(self, h5_path: str, keys: Optional[List[str]] = None):
        self.h5_path = h5_path
        self.keys = self._check_keys(keys)

    def _list_keys(self) -> List[str]:
        with h5py.File(self.h5_path, "r") as f:
            if "trades" not in f:
                return []
            return [f"/trades/{k}" for k in sorted(f["trades"].keys())]

    def _check_keys(self, keys):
        available = self._list_keys()
        if keys:
            keys = [k if k.startswith("/trades/") else f"/trades/{k}" for k in keys]
            missing = [k for k in keys if k not in available]
            if missing:
                raise KeyError(f"Missing keys: {missing}\nAvailable keys: {available}")
            return keys
        return available

    def process_key(self, key: str, overwrite: bool = False) -> bool:
        from ..bar.data_model import TradesData
        from ..bar.kit import TimeBarKit

        if not key.startswith("/trades/"):
            key = f"/trades/{key}"
        month_key = key.rsplit("/", 1)[-1]
        timebar_key = f"/klines/{month_key}"

        with h5py.File(self.h5_path, "r") as f:
            if timebar_key in f and not overwrite:
                logger.info(f"Time bars already exist for {month_key}. Skipping.")
                return False

        logger.info(f"Loading trades data for {month_key}...")
        trades = TradesData.load_trades_h5(self.h5_path, key=month_key)

        logger.info(f"Building 1-second time bars for {month_key}...")
        bars_df = TimeBarKit(trades, period=pd.Timedelta(seconds=1)).build_ohlcv()

        with h5py.File(self.h5_path, "a") as f:
            if timebar_key in f:
                del f[timebar_key]
            g = f.create_group(timebar_key)
            ts = bars_df.index.values.astype("datetime64[ns]").astype(np.int64)
            g.create_dataset("timestamp", data=ts, compression="lzf")
            for col in _KLINE_COLS:
                g.create_dataset(col, data=bars_df[col].values, compression="lzf")
            meta_key = f"/klines_meta/{month_key}"
            if meta_key in f:
                del f[meta_key]
            m = f.create_group(meta_key)
            m.attrs["record_count"] = len(bars_df)
            m.attrs["first_timestamp"] = int(ts[0])
            m.attrs["last_timestamp"] = int(ts[-1])
            m.attrs["original_trades_key"] = key
        logger.info(f"Added time bars for {month_key}: {len(bars_df)} bars.")
        return True

    def process_all(self, overwrite: bool = False) -> Dict[str, bool]:
        results = {}
        for key in self.keys:
            try:
                results[key] = self.process_key(key, overwrite)
            except Exception as e:
                logger.error(f"Error processing {key}: {e}")
                results[key] = False
        ok = sum(results.values())
        logger.info(f"Processed {len(results)} keys with {ok} successes.")
        return results


class TimeBarReader:
    """Read 1s klines with range filtering and timeframe resampling."""

    def __init__(self, h5_path: str):
        self.h5_path = h5_path

    def list_keys(self) -> List[str]:
        with h5py.File(self.h5_path, "r") as f:
            if "klines" not in f:
                return []
            return [f"/klines/{k}" for k in sorted(f["klines"].keys())]

    def get_time_range(self):
        first = last = None
        with h5py.File(self.h5_path, "r") as f:
            if "klines_meta" not in f:
                raise ValueError("No klines metadata found.")
            for k in f["klines_meta"]:
                a = f[f"/klines_meta/{k}"].attrs
                cf = pd.to_datetime(a["first_timestamp"], unit="ns")
                cl = pd.to_datetime(a["last_timestamp"], unit="ns")
                first = cf if first is None or cf < first else first
                last = cl if last is None or cl > last else last
        return first, last

    def _find_relevant_keys(self, start_time=None, end_time=None) -> List[str]:
        out = []
        with h5py.File(self.h5_path, "r") as f:
            if "klines_meta" not in f:
                return out
            for k in f["klines_meta"]:
                a = f[f"/klines_meta/{k}"].attrs
                kf = pd.to_datetime(a["first_timestamp"], unit="ns")
                kl = pd.to_datetime(a["last_timestamp"], unit="ns")
                if ((start_time is None or kl >= start_time)
                        and (end_time is None or kf <= end_time)):
                    out.append(f"/klines/{k}")
        return sorted(out)

    def _load_key(self, key: str) -> pd.DataFrame:
        with h5py.File(self.h5_path, "r") as f:
            g = f[key]
            data = {c: g[c][:] for c in _KLINE_COLS}
            ts = g["timestamp"][:]
        df = pd.DataFrame(data, index=pd.to_datetime(ts, unit="ns"))
        df.index.name = "timestamp"
        return df

    def read(self, start_time=None, end_time=None,
             timeframe: Optional[str] = None) -> pd.DataFrame:
        if isinstance(start_time, str):
            start_time = pd.Timestamp(start_time)
        if isinstance(end_time, str):
            end_time = pd.Timestamp(end_time)

        original_end_time = None
        if end_time is not None and end_time.time() == dt.time(0, 0):
            original_end_time = end_time
            end_time = end_time + pd.Timedelta(days=1) - pd.Timedelta(microseconds=1)

        keys = self._find_relevant_keys(start_time, end_time)
        if not keys:
            logger.warning(f"No data found for time range: {start_time} to {end_time}")
            return pd.DataFrame()

        df = pd.concat([self._load_key(k) for k in keys])
        if start_time is not None:
            df = df[df.index >= start_time]
        if end_time is not None:
            df = df[df.index <= end_time]
        if timeframe is None:
            return df

        resampled = self._resample(df, timeframe)
        if timeframe.upper().endswith("D") and original_end_time is not None:
            # exclude the trailing incomplete day (reference io.py:873-880)
            resampled = resampled[resampled.index <= original_end_time - pd.Timedelta(days=1)]
        return resampled

    @staticmethod
    def _resample(df: pd.DataFrame, timeframe: str) -> pd.DataFrame:
        grouper = df.index.floor(timeframe)
        resampled = df.groupby(grouper, sort=False).agg({
            "open": "first", "high": "max", "low": "min", "close": "last",
            "volume": "sum", "trades": "sum",
        })
        vol_sum = df["volume"].groupby(grouper, sort=False).sum()
        vwap = (df["vwap"] * df["volume"]).groupby(grouper, sort=False).sum() / vol_sum
        resampled["vwap"] = vwap.astype("float32")

        def w_median(sub: pd.DataFrame) -> float:
            """Volume(trade-count)-weighted median of per-second medians."""
            if sub.empty:
                return np.nan
            order = np.argsort(sub["median_trade_size"].values)
            sizes = sub["median_trade_size"].values[order]
            weights = sub["trades"].values[order].astype(np.float64)
            cum_w = np.cumsum(weights)
            if cum_w[-1] <= 0:
                return np.nan
            cutoff = cum_w[-1] * 0.5
            return float(sizes[np.searchsorted(cum_w, cutoff, side="left")])

        resampled["median_trade_size"] = (
            df.groupby(grouper, sort=False, observed=True)
            .apply(w_median).astype("float32"))
        return resampled.dropna(subset=["open"])

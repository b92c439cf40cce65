"""Monthly-partitioned HDF5 trade store (h5py backend).

Parity: /root/reference/finmlkit/bar/data_model.py:420-772 (save_h5 /
load_trades_h5) and bar/io.py:86-308 (H5Inspector). The reference uses
pandas HDFStore/PyTables; this environment ships h5py, so the same schema
is kept at the group level with columnar datasets:

    /trades/YYYY-MM/{timestamp,price,amount,side}
    /meta/YYYY-MM           (attrs: record_count, first/last_timestamp,
                             data_integrity_ok, missing_pct)
    /integrity/YYYY-MM/...  (discontinuity table columns)
    /klines/YYYY-MM/...     (1s OHLCV, see finmlkit_tpu.data.klines)

Months are independently written/overwritten — the partition scheme *is*
the checkpoint/resume system, as in the reference.
"""
import concurrent.futures
import os
from typing import List, Optional

import h5py
import numpy as np
import pandas as pd

from ..utils.log import get_logger

logger = get_logger(__name__)

_COMP = dict(compression="lzf")  # blosc unavailable; lzf = fast/light


def _month_key_of(ts_ns: int) -> str:
    dt = pd.to_datetime(ts_ns, unit="ns")
    return f"{dt.year:04d}-{dt.month:02d}"


def save_trades_h5(trades, filepath: str, *, month_key: Optional[str] = None,
                   mode: str = "a", overwrite_month: bool = True, **_ignored) -> str:
    """Persist a TradesData month under ``/trades/YYYY-MM``.

    Returns the trades key path, e.g. ``/trades/2021-03``.
    """
    df = trades.data
    if month_key is None:
        month_key = _month_key_of(int(df["timestamp"].iloc[0]))
    h5_key = f"/trades/{month_key}"

    parent = os.path.dirname(os.path.abspath(filepath))
    os.makedirs(parent, exist_ok=True)

    with h5py.File(filepath, "w" if mode == "w" else "a") as f:
        if h5_key in f:
            if not overwrite_month:
                logger.info(f"Month {month_key} exists; skipping (overwrite_month=False).")
                return h5_key
            del f[h5_key]
            for k in (f"/meta/{month_key}", f"/integrity/{month_key}"):
                if k in f:
                    del f[k]
        g = f.create_group(h5_key)
        g.create_dataset("timestamp", data=df["timestamp"].values.astype(np.int64), **_COMP)
        g.create_dataset("price", data=df["price"].values.astype(np.float64), **_COMP)
        g.create_dataset("amount", data=df["amount"].values.astype(np.float32), **_COMP)
        if "side" in df.columns:
            g.create_dataset("side", data=df["side"].values.astype(np.int8), **_COMP)

        m = f.create_group(f"/meta/{month_key}")
        m.attrs["record_count"] = len(df)
        m.attrs["first_timestamp"] = int(df["timestamp"].iloc[0])
        m.attrs["last_timestamp"] = int(df["timestamp"].iloc[-1])
        m.attrs["data_integrity_ok"] = bool(trades.data_ok) if trades.data_ok is not None else True
        m.attrs["missing_pct"] = float(trades.missing_pct)

        if trades.discontinuities:
            ig = f.create_group(f"/integrity/{month_key}")
            rows = trades.discontinuities
            ig.create_dataset("start_id", data=np.array([r["start_id"] for r in rows], np.int64))
            ig.create_dataset("end_id", data=np.array([r["end_id"] for r in rows], np.int64))
            ig.create_dataset("missing_ids", data=np.array([r["missing_ids"] for r in rows], np.int64))
            ig.create_dataset("pre_gap_time", data=np.array(
                [pd.Timestamp(r["pre_gap_time"]).value for r in rows], np.int64))
            ig.create_dataset("post_gap_time", data=np.array(
                [pd.Timestamp(r["post_gap_time"]).value for r in rows], np.int64))
    logger.info(f"Saved {len(df):,} trades under {h5_key}")
    return h5_key


def _keys_for_timerange(keys: List[str], start_ts: Optional[int],
                        end_ts: Optional[int]) -> List[str]:
    """Select monthly keys overlapping [start_ts, end_ts] (ns)."""
    out = []
    for k in keys:
        y, m = k.split("-")
        m_start = pd.Timestamp(year=int(y), month=int(m), day=1).value
        m_end = (pd.Timestamp(year=int(y), month=int(m), day=1)
                 + pd.offsets.MonthEnd(1) + pd.Timedelta(days=1)).value
        if start_ts is not None and m_end < start_ts:
            continue
        if end_ts is not None and m_start > end_ts:
            continue
        out.append(k)
    return out


def _load_single_group(filepath: str, month_key: str) -> dict:
    """Worker: load one month's columns (own file handle, process-safe)."""
    with h5py.File(filepath, "r") as f:
        g = f[f"/trades/{month_key}"]
        out = {name: g[name][:] for name in g.keys()}
    return out


def load_trades_h5(filepath: str, *, key: Optional[str] = None,
                   start_time=None, end_time=None,
                   enable_multiprocessing: bool = False, max_workers: int = 4):
    """Load (a time range of) trades from the monthly store into TradesData.

    Parity: data_model.py:596-772 — metadata-driven key discovery,
    optional parallel per-month loading with sequential fallback,
    per-group errors skip the group.
    """
    from ..bar.data_model import TradesData

    start_ts = pd.Timestamp(start_time).value if start_time is not None else None
    end_ts = pd.Timestamp(end_time).value if end_time is not None else None

    with h5py.File(filepath, "r") as f:
        if "trades" not in f:
            raise KeyError(f"No /trades groups in {filepath}")
        all_keys = sorted(f["trades"].keys())
    if key is not None:
        month = key.rsplit("/", 1)[-1]
        if month not in all_keys:
            raise KeyError(f"Month {month} not in store (available: {all_keys})")
        all_keys = [month]
    keys = _keys_for_timerange(all_keys, start_ts, end_ts)
    if not keys:
        raise ValueError(f"No monthly groups overlap requested range in {filepath}")

    results = {}
    if enable_multiprocessing and len(keys) > 1:
        try:
            with concurrent.futures.ProcessPoolExecutor(max_workers=max_workers) as ex:
                futs = {ex.submit(_load_single_group, filepath, k): k for k in keys}
                for fut in concurrent.futures.as_completed(futs):
                    k = futs[fut]
                    try:
                        results[k] = fut.result()
                    except Exception as e:  # skip failed group
                        logger.error(f"Failed loading {k}: {e}")
        except Exception as e:
            logger.warning(f"Parallel load failed ({e}); falling back to sequential.")
            results = {}
    if not results:
        for k in keys:
            try:
                results[k] = _load_single_group(filepath, k)
            except Exception as e:
                logger.error(f"Failed loading {k}: {e}")
    if not results:
        raise ValueError("All monthly group loads failed.")

    cols = {}
    for name in ("timestamp", "price", "amount", "side"):
        parts = [results[k][name] for k in sorted(results) if name in results[k]]
        if parts:
            cols[name] = np.concatenate(parts)

    mask = None
    ts = cols["timestamp"]
    if start_ts is not None or end_ts is not None:
        mask = np.ones(len(ts), bool)
        if start_ts is not None:
            mask &= ts >= start_ts
        if end_ts is not None:
            mask &= ts <= end_ts
        cols = {k: v[mask] for k, v in cols.items()}

    return TradesData(
        cols["timestamp"], cols["price"], cols["amount"],
        side=cols.get("side"), timestamp_unit="ns",
        dt_index=pd.to_datetime(cols["timestamp"], unit="ns"),
    )


def _find_gaps_month(args):
    """Worker: find > max_gap_ns gaps in one month's timestamps."""
    filepath, month, max_gap_ns = args
    with h5py.File(filepath, "r") as f:
        ts = f[f"/trades/{month}/timestamp"][:]
    if len(ts) < 2:
        return []
    d = np.diff(ts)
    idx = np.flatnonzero(d > max_gap_ns)
    return [(month, pd.Timestamp(int(ts[i]), unit="ns"),
             pd.Timestamp(int(ts[i + 1]), unit="ns"),
             pd.Timedelta(int(d[i]), unit="ns")) for i in idx]


class H5Inspector:
    """Diagnostics over the monthly store.

    Parity: /root/reference/finmlkit/bar/io.py:86-308 — key listing,
    metadata retrieval, integrity info, statistics and a summary report.
    """

    def __init__(self, filepath: str):
        self.filepath = filepath

    def list_keys(self) -> List[str]:
        with h5py.File(self.filepath, "r") as f:
            if "trades" not in f:
                return []
            return [f"/trades/{k}" for k in sorted(f["trades"].keys())]

    def get_metadata(self, key: str) -> dict:
        month = key.rsplit("/", 1)[-1]
        with h5py.File(self.filepath, "r") as f:
            mk = f"/meta/{month}"
            if mk not in f:
                raise KeyError(f"No metadata for {key}")
            return dict(f[mk].attrs)

    def get_integrity_info(self, key: str) -> Optional[pd.DataFrame]:
        month = key.rsplit("/", 1)[-1]
        with h5py.File(self.filepath, "r") as f:
            ik = f"/integrity/{month}"
            if ik not in f:
                return None
            g = f[ik]
            df = pd.DataFrame({name: g[name][:] for name in g.keys()})
        for c in ("pre_gap_time", "post_gap_time"):
            if c in df:
                df[c] = pd.to_datetime(df[c], unit="ns")
        return df

    def get_statistics(self, key: str) -> dict:
        month = key.rsplit("/", 1)[-1]
        with h5py.File(self.filepath, "r") as f:
            g = f[f"/trades/{month}"]
            px = g["price"]
            n = px.shape[0]
            return {
                "records": n,
                "price_min": float(px[:].min()) if n else np.nan,
                "price_max": float(px[:].max()) if n else np.nan,
                "total_volume": float(g["amount"][:].sum()) if n else 0.0,
            }

    def inspect_gaps(self, max_gap: pd.Timedelta = None, processes: int = 4):
        """Scan every month for temporal gaps larger than ``max_gap``.

        Parity: /root/reference/finmlkit/bar/io.py:200-223 (multiprocess
        per-month gap scan). Returns a DataFrame of gaps with month,
        start/end timestamps and duration.
        """
        if max_gap is None:
            max_gap = pd.Timedelta(minutes=1)
        months = [k.rsplit("/", 1)[-1] for k in self.list_keys()]
        args = [(self.filepath, m, int(max_gap.value)) for m in months]
        rows = []
        try:
            with concurrent.futures.ProcessPoolExecutor(max_workers=processes) as ex:
                for out in ex.map(_find_gaps_month, args):
                    rows.extend(out)
        except Exception as e:
            logger.warning(f"Parallel gap scan failed ({e}); sequential fallback.")
            rows = [g for a in args for g in _find_gaps_month(a)]
        df = pd.DataFrame(rows, columns=["month", "gap_start", "gap_end",
                                         "duration"])
        if len(df):
            df["gap_start"] = pd.to_datetime(df["gap_start"])
            df["gap_end"] = pd.to_datetime(df["gap_end"])
        return df

    def get_integrity_summary(self) -> pd.DataFrame:
        rows = []
        for key in self.list_keys():
            month = key.rsplit("/", 1)[-1]
            try:
                meta = self.get_metadata(key)
            except KeyError:
                meta = {}
            integ = self.get_integrity_info(key)
            rows.append({
                "month": month,
                "record_count": meta.get("record_count", np.nan),
                "data_integrity_ok": meta.get("data_integrity_ok", True),
                "missing_pct": meta.get("missing_pct", 0.0),
                "n_discontinuities": 0 if integ is None else len(integ),
            })
        return pd.DataFrame(rows)

"""Binance raw-trades acquisition CLI: download -> preprocess -> HDF5 -> klines.

Parity: /root/reference/scripts/binance2h5.py — downloads monthly trade
ZIPs from data.binance.vision (spot/um/cm), verifies checksums, runs a
pipeline-parallel preprocess (process pool of TradesData workers feeding
a single HDF5 writer thread via a queue), then builds 1-second klines.

This module is the single implementation; ``scripts/binance2h5.py`` at
the repo root is a thin shim kept to mirror the reference layout. The
installed console entry point (``binance2h5``) targets :func:`main`.

Usage:
    binance2h5 --tickers BTCUSDT --start 2024-01 \
        --end 2024-03 --market spot --output-dir ./data --workers 4
"""
import argparse
import hashlib
import io
import os
import queue
import threading
import urllib.request
import zipfile
from multiprocessing import Pool

import numpy as np
import pandas as pd

from ..bar.data_model import TradesData
from ..data.klines import AddTimeBarH5
from ..utils.log import get_logger

logger = get_logger(__name__)

_BASE = {
    "spot": "https://data.binance.vision/data/spot/monthly/trades",
    "um": "https://data.binance.vision/data/futures/um/monthly/trades",
    "cm": "https://data.binance.vision/data/futures/cm/monthly/trades",
}

# Binance monthly trade CSV columns (no header in spot files)
_COLS = ["id", "price", "qty", "quote_qty", "time", "is_buyer_maker"]


def month_range(start: str, end: str):
    cur = pd.Period(start, freq="M")
    stop = pd.Period(end, freq="M")
    while cur <= stop:
        yield str(cur)
        cur += 1


def download(url: str, dest: str, retries: int = 2) -> str:
    for attempt in range(retries + 1):
        try:
            logger.info(f"Downloading {url}")
            urllib.request.urlretrieve(url, dest)
            return dest
        except Exception as e:
            if attempt == retries:
                raise
            logger.warning(f"Download failed ({e}); retrying...")
    return dest


def verify_checksum(zip_path: str, checksum_path: str) -> bool:
    """sha256 verification against the .CHECKSUM sidecar file."""
    with open(checksum_path) as f:
        expected = f.read().split()[0].strip()
    h = hashlib.sha256()
    with open(zip_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest() == expected


def load_csv_from_zip(zip_path: str) -> pd.DataFrame:
    """Normalize a monthly trades ZIP into the standard schema."""
    with zipfile.ZipFile(zip_path) as z:
        name = z.namelist()[0]
        with z.open(name) as f:
            head = f.read(256)
        has_header = head.split(b"\n", 1)[0].startswith(b"id,") or b"price" in head.split(b"\n", 1)[0]
        with z.open(name) as f:
            df = pd.read_csv(
                io.BytesIO(f.read()),
                names=None if has_header else _COLS,
                header=0 if has_header else None,
            )
    df.columns = [c.strip().lower().replace(" ", "_") for c in df.columns]
    if "qty" not in df.columns and "amount" in df.columns:
        df = df.rename(columns={"amount": "qty"})
    if "time" not in df.columns and "timestamp" in df.columns:
        df = df.rename(columns={"timestamp": "time"})
    return df


def _process_task(args):
    """Worker: ZIP -> preprocessed TradesData column arrays."""
    zip_path, month = args
    df = load_csv_from_zip(zip_path)
    trades = TradesData(
        df["time"].values.astype(np.int64),
        df["price"].values.astype(np.float64),
        df["qty"].values.astype(np.float32),
        df["id"].values.astype(np.int64),
        is_buyer_maker=df["is_buyer_maker"].values.astype(bool),
        preprocess=True,
        name=month,
    )
    d = trades.data
    return month, {
        "timestamp": d["timestamp"].values,
        "price": d["price"].values,
        "amount": d["amount"].values,
        "side": d["side"].values,
    }, trades.data_ok, trades.missing_pct, trades.discontinuities


def _writer(h5_path: str, q: "queue.Queue", errors: list):
    """Single writer thread: drains preprocessed months into the store.

    Any write failure is recorded in ``errors`` and the thread keeps
    draining the queue (so the bounded-queue producer never deadlocks);
    the caller re-raises after join.
    """
    from ..data.store import save_trades_h5

    class _Shim:
        pass

    while True:
        item = q.get()
        if item is None:
            break
        if errors:
            continue  # drain without writing after a failure
        month, cols, data_ok, missing_pct, disc = item
        shim = _Shim()
        shim.data = pd.DataFrame(cols)
        shim.data_ok = data_ok
        shim.missing_pct = missing_pct
        shim.discontinuities = disc
        try:
            save_trades_h5(shim, h5_path, month_key=month)
        except Exception as e:  # noqa: BLE001 - re-raised by process_all
            logger.error(f"Writer failed on {month}: {e}")
            errors.append(e)
            continue
        logger.info(f"Wrote {month} ({len(cols['timestamp']):,} trades)")


def process_all(zip_months, h5_path: str, workers: int):
    """Pipeline parallelism: pool preprocesses months, writer thread
    drains a queue into HDF5 (reference binance2h5.py:230-267)."""
    q = queue.Queue(maxsize=2)
    errors: list = []
    wt = threading.Thread(target=_writer, args=(h5_path, q, errors))
    wt.start()
    try:
        if workers > 1:
            with Pool(workers) as pool:
                for result in pool.imap(_process_task, zip_months):
                    q.put(result)
        else:
            for zm in zip_months:
                q.put(_process_task(zm))
    finally:
        q.put(None)
        wt.join()
    if errors:
        raise errors[0]


def orchestrate_symbol(ticker: str, months, market: str, out_dir: str,
                       workers: int, keep_zips: bool):
    base = _BASE[market]
    h5_path = os.path.join(out_dir, f"{ticker}.h5")
    os.makedirs(out_dir, exist_ok=True)
    zip_months = []
    for month in months:
        fname = f"{ticker}-trades-{month}.zip"
        url = f"{base}/{ticker}/{fname}"
        zip_path = os.path.join(out_dir, fname)
        if not os.path.exists(zip_path):
            download(url, zip_path)
            try:
                cs_path = zip_path + ".CHECKSUM"
                download(url + ".CHECKSUM", cs_path)
                if not verify_checksum(zip_path, cs_path):
                    logger.warning(f"Checksum mismatch for {fname}; re-downloading once")
                    download(url, zip_path)
                    if not verify_checksum(zip_path, cs_path):
                        raise ValueError(f"Checksum verification failed for {fname}")
            except urllib.error.URLError:
                logger.warning(f"No checksum available for {fname}")
        zip_months.append((zip_path, month))

    process_all(zip_months, h5_path, workers)
    AddTimeBarH5(h5_path).process_all()

    if not keep_zips:
        for zp, _ in zip_months:
            for p in (zp, zp + ".CHECKSUM"):
                if os.path.exists(p):
                    os.remove(p)
    logger.info(f"Done: {h5_path}")


def main():
    ap = argparse.ArgumentParser(description="Binance monthly trades -> HDF5 + klines")
    ap.add_argument("--tickers", nargs="+", required=True)
    ap.add_argument("--start", required=True, help="start month YYYY-MM")
    ap.add_argument("--end", required=True, help="end month YYYY-MM")
    ap.add_argument("--market", choices=list(_BASE), default="spot")
    ap.add_argument("--output-dir", default="./data")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--keep-zips", action="store_true")
    args = ap.parse_args()

    months = list(month_range(args.start, args.end))
    for ticker in args.tickers:
        orchestrate_symbol(ticker, months, args.market, args.output_dir,
                           args.workers, args.keep_zips)


if __name__ == "__main__":
    main()

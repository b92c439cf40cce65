"""Multi-host / multi-process ingestion feeding the time mesh.

TPU-native analog of the reference's process-level load parallelism
(ProcessPoolExecutor monthly H5 loads at
/root/reference/finmlkit/bar/data_model.py:689-732 and the
Pool+writer-thread download pipeline at scripts/binance2h5.py:230-267),
mapped onto the sharded compute path (SURVEY.md §2.8 item 3):

- **contiguous month plan**: each host owns the contiguous row span its
  mesh devices cover. Month record counts come from the store's
  ``/meta`` groups, so the plan needs no data reads; a host loads only
  the months overlapping its span — per-host memory is
  ``O(total / n_hosts + straddling months)`` (the overlap rows of a month that
  straddles a host boundary are the only duplicated I/O; nothing is
  ever all-gathered).
- **host-side parallel load**: each host loads its months with its own
  HDF5 handles (process-safe) in a process pool, sequential fallback on
  pool failure (reference behavior, data_model.py:730-732).
- **device placement**: ``jax.make_array_from_callback`` builds the
  globally-sharded trade arrays from per-host local rows — each host
  materializes data for its addressable devices only, which is the
  jax.distributed multi-host placement model. Indexers then run ON the
  mesh via :mod:`finmlkit_tpu.parallel.sharded_indexers`.
"""
import concurrent.futures
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.store import _load_single_group
from ..utils.log import get_logger

logger = get_logger(__name__)

_COLS = ("timestamp", "price", "amount", "side")
_DTYPES = {"timestamp": np.int64, "price": np.float64,
           "amount": np.float32, "side": np.int8}


def month_plan(months: Sequence[str], n_processes: int) -> List[List[str]]:
    """Contiguous month → process assignment, preserving time order.

    Without record counts the split is even by month count; use
    :func:`row_plan` when per-month counts are known (the mesh path).
    """
    months = sorted(months)
    n = len(months)
    bounds = [round(p * n / n_processes) for p in range(n_processes + 1)]
    return [months[bounds[p]:bounds[p + 1]] for p in range(n_processes)]


def row_plan(month_counts: Dict[str, int], n_processes: int,
             n_padded: Optional[int] = None
             ) -> Tuple[List[dict], List[Tuple[int, int]]]:
    """Row-exact ingestion plan: which months and which row range each
    process loads, for a contiguous equal-row split of the padded
    global stream.

    :param month_counts: ordered ``{month_key: record_count}``.
    :param n_padded: padded global length (multiple of the mesh size);
        defaults to the raw total.
    :returns: (per-process plans, per-process (row_start, row_end)).
        Each plan is ``{"months": [...], "skip": rows_to_drop_from_the
        first_month, "take": real_rows_in_my_span}``.
    """
    months = sorted(month_counts)
    counts = np.array([month_counts[m] for m in months], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])  # month row offsets
    total = int(offsets[-1])
    n_pad = total if n_padded is None else int(n_padded)
    spans = [(p * n_pad // n_processes, (p + 1) * n_pad // n_processes)
             for p in range(n_processes)]
    plans = []
    for lo, hi in spans:
        lo_c, hi_c = min(lo, total), min(hi, total)
        first = int(np.searchsorted(offsets, lo_c, side="right")) - 1
        last = int(np.searchsorted(offsets, max(hi_c - 1, lo_c), side="right")) - 1
        first = max(first, 0)
        last = max(last, first)
        sel = months[first:last + 1] if hi_c > lo_c else []
        plans.append({
            "months": sel,
            "skip": int(lo_c - offsets[first]) if sel else 0,
            "take": int(hi_c - lo_c),
        })
    return plans, spans


def load_months_parallel(filepath: str, months: Sequence[str],
                         max_workers: int = 4) -> dict:
    """Load monthly groups in a process pool; sequential fallback on any
    pool failure (reference behavior, data_model.py:730-732)."""
    months = sorted(months)
    results = {}
    if max_workers > 1 and len(months) > 1:
        try:
            with concurrent.futures.ProcessPoolExecutor(max_workers=max_workers) as ex:
                futs = {ex.submit(_load_single_group, filepath, m): m for m in months}
                for fut in concurrent.futures.as_completed(futs):
                    results[futs[fut]] = fut.result()
        except Exception as e:
            logger.warning(f"Parallel month load failed ({e}); sequential fallback.")
            results = {}
    if not results:
        for m in months:
            results[m] = _load_single_group(filepath, m)
    cols = {}
    for name in _COLS:
        have = [m for m in months if name in results[m]]
        if not have:
            continue
        if len(have) != len(months):
            missing = [m for m in months if name not in results[m]]
            raise ValueError(
                f"column {name!r} present in months {have} but missing in "
                f"{missing}; a partially-present column would silently "
                f"misalign the concatenated stream")
        cols[name] = np.concatenate([results[m][name] for m in months])
    return cols


def _month_counts(filepath: str, months: Sequence[str]) -> Dict[str, int]:
    import h5py

    counts = {}
    with h5py.File(filepath, "r") as f:
        for m in months:
            mk = f"meta/{m}"
            if mk in f and "record_count" in f[mk].attrs:
                counts[m] = int(f[mk].attrs["record_count"])
            else:  # shape lookup only — no data read
                counts[m] = int(f[f"trades/{m}/timestamp"].shape[0])
    return counts


def load_store_to_mesh(filepath: str, mesh, axis_name: str = "t", *,
                       months: Optional[Sequence[str]] = None,
                       max_workers: int = 4):
    """Load a monthly trade store and place it sharded on the time mesh.

    Memory-scalable multi-host path: every process loads ONLY the months
    overlapping its contiguous row span (computed from /meta record
    counts) and materializes device shards for its addressable devices
    via ``make_array_from_callback`` — no cross-host gather of trade
    rows ever happens; per-host memory is O(total/n_hosts + straddling months).

    :param filepath: monthly-partitioned H5 store (see data/store.py).
    :param mesh: 1-D ``jax.sharding.Mesh`` over the trade/time axis.
    :param months: subset of month keys (default: all, discovered from
        the store — on multi-host, discovery must agree across hosts).
    :param max_workers: host-side loader processes per host.
    :returns: (sharded trades dict — timestamp/price/amount/side device
        arrays laid out on the mesh, n_trades before padding, the local
        host columns covering this process's row span).
    """
    import h5py
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if months is None:
        with h5py.File(filepath, "r") as f:
            months = sorted(f["trades"].keys())
    months = sorted(months)

    n_proc = jax.process_count()
    pid = jax.process_index()
    counts = _month_counts(filepath, months)
    total = int(sum(counts.values()))

    n_devices = mesh.shape[axis_name]
    n_padded = ((total + n_devices - 1) // n_devices) * n_devices
    plans, spans = row_plan(counts, n_proc, n_padded)
    my = plans[pid]
    lo, hi = spans[pid]

    local_cols = load_months_parallel(filepath, my["months"], max_workers)
    sharded = {}
    sharding = NamedSharding(mesh, P(axis_name))
    for name in list(local_cols):
        arr = local_cols[name][my["skip"]:]
        real = np.ascontiguousarray(arr[: my["take"]])
        local_cols[name] = real
        pad = (hi - lo) - len(real)
        if pad > 0:  # tail padding (last host only): edge/zero fill
            fill = np.zeros(pad, real.dtype) if name == "amount" else \
                np.repeat(real[-1:] if len(real) else
                          np.zeros(1, _DTYPES.get(name, real.dtype)), pad)
            padded = np.concatenate([real, fill])
        else:
            padded = real

        def cb(index, _arr=padded):
            (sl,) = index
            start = 0 if sl.start is None else sl.start
            stop = n_padded if sl.stop is None else sl.stop
            return _arr[start - lo: stop - lo]

        sharded[name] = jax.make_array_from_callback(
            (n_padded,), sharding, cb)
    return sharded, total, local_cols

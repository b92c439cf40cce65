"""Multi-host / multi-process ingestion feeding the time mesh.

TPU-native analog of the reference's process-level load parallelism
(ProcessPoolExecutor monthly H5 loads at
/root/reference/finmlkit/bar/data_model.py:689-732 and the
Pool+writer-thread download pipeline at scripts/binance2h5.py:230-267),
mapped onto the sharded compute path (SURVEY.md §2.8 item 3):

- **month plan**: monthly store partitions are assigned round-robin to
  processes (hosts), preserving time order;
- **host-side parallel load**: each process loads only its months, with
  its own HDF5 handles (process-safe), in a pool of workers;
- **device placement**: the concatenated stream is padded and laid out
  along the 1-D time mesh (:func:`shard_trades`), so
  :func:`sharded_bar_products` and the order-statistics kernels consume
  it directly.

On a real multi-host pod (``jax.process_count() > 1``) the columns are
exchanged host-side with ``multihost_utils.process_allgather`` before
placement — simple and correct; a halo-free variant that ships only
shard-boundary rows over DCN is the documented follow-up. On a single
controller (this environment, incl. the 8-device virtual CPU mesh) no
exchange is needed.
"""
import concurrent.futures
from typing import List, Optional, Sequence

import numpy as np

from ..data.store import _load_single_group
from ..utils.log import get_logger
from .sharded import shard_trades

logger = get_logger(__name__)

_COLS = ("timestamp", "price", "amount", "side")


def month_plan(months: Sequence[str], n_processes: int) -> List[List[str]]:
    """Round-robin month → process assignment, preserving sort order.

    Mirrors the reference's one-month-per-worker decomposition; with
    n_processes=1 this is a single sequential plan.
    """
    months = sorted(months)
    return [list(months[p::n_processes]) for p in range(n_processes)]


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


def load_store_to_mesh(filepath: str, mesh, axis_name: str = "t", *,
                       months: Optional[Sequence[str]] = None,
                       max_workers: int = 4):
    """Load a monthly trade store and place it sharded on the time mesh.

    :param filepath: monthly-partitioned H5 store (see data/store.py).
    :param mesh: 1-D ``jax.sharding.Mesh`` over the trade/time axis.
    :param months: subset of month keys (default: all, discovered from
        the store — on multi-host, discovery must agree across hosts).
    :param max_workers: host-side loader processes per host.
    :returns: (sharded trades dict for :func:`sharded_bar_products`,
        n_trades before padding, host-side numpy columns).
    """
    import h5py
    import jax

    if months is None:
        with h5py.File(filepath, "r") as f:
            months = sorted(f["trades"].keys())

    n_proc = jax.process_count()
    pid = jax.process_index()
    plan = month_plan(months, n_proc)
    local_cols = load_months_parallel(filepath, plan[pid], max_workers)

    if n_proc > 1:
        # host-side exchange so every process holds the global stream in
        # time order before placement (see module docstring)
        from jax.experimental import multihost_utils
        gathered = {name: multihost_utils.process_allgather(local_cols[name])
                    for name in local_cols}
        # per-process chunks arrive stacked in process order; months were
        # dealt round-robin, so re-sort globally by timestamp
        cols = {name: np.concatenate(list(v)) for name, v in gathered.items()}
        order = np.argsort(cols["timestamp"], kind="stable")
        cols = {name: v[order] for name, v in cols.items()}
    else:
        cols = local_cols

    n = len(cols["timestamp"])
    arrays = {"price": cols["price"].astype(np.float64),
              "amount": cols["amount"].astype(np.float32)}
    if "side" in cols:
        arrays["side"] = cols["side"].astype(np.int8)
    sharded = shard_trades(arrays, mesh, axis_name)
    sharded["timestamp"] = cols["timestamp"]  # host-side (indexers run once)
    return sharded, n, cols

"""Device mesh construction for time-sharded tick pipelines.

The reference's parallelism is process-level (ProcessPoolExecutor over
monthly H5 groups, bar/data_model.py:689-732); the TPU-native analog is a
1-D device mesh over the *time axis* of the trade stream (optionally a
second axis over symbols), per SURVEY.md §2.8/§7. Shard boundaries carry
state (partial bars, CUSUM s+/s-, dollar remainders) exchanged via ICI
collectives inside shard_map programs.
"""
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def time_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = "t") -> Mesh:
    """1-D mesh over the trade/time axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices), (axis_name,))


def symbol_time_mesh(n_symbol: int, n_time: int,
                     devices: Optional[Sequence] = None) -> Mesh:
    """2-D (symbol x time) mesh for multi-symbol pipelines."""
    import numpy as np
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_symbol * n_time]).reshape(n_symbol, n_time)
    return Mesh(devices, ("s", "t"))

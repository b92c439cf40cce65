from .mesh import time_mesh
from .ingest import load_months_parallel, load_store_to_mesh, month_plan
from .sharded import (
    shard_trades,
    sharded_bar_products,
    sharded_median_trade_size,
    sharded_segment_kth,
    sharded_trade_size_features,
)

__all__ = [
    "time_mesh",
    "load_months_parallel",
    "load_store_to_mesh",
    "month_plan",
    "sharded_bar_products",
    "shard_trades",
    "sharded_median_trade_size",
    "sharded_segment_kth",
    "sharded_trade_size_features",
]

from .mesh import time_mesh
from .sharded import (
    shard_trades,
    sharded_bar_products,
    sharded_median_trade_size,
    sharded_segment_kth,
    sharded_trade_size_features,
)

__all__ = [
    "time_mesh",
    "sharded_bar_products",
    "shard_trades",
    "sharded_median_trade_size",
    "sharded_segment_kth",
    "sharded_trade_size_features",
]

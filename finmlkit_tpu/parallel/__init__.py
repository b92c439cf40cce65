from .mesh import time_mesh
from .sharded import sharded_bar_products, shard_trades

__all__ = ["time_mesh", "sharded_bar_products", "shard_trades"]

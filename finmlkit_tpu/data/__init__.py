from .store import save_trades_h5, load_trades_h5, H5Inspector
from .klines import AddTimeBarH5, TimeBarReader

__all__ = ["save_trades_h5", "load_trades_h5", "H5Inspector",
           "AddTimeBarH5", "TimeBarReader"]

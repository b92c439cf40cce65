from .store import save_trades_h5, load_trades_h5, H5Inspector

__all__ = ["save_trades_h5", "load_trades_h5", "H5Inspector"]

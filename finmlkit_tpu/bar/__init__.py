from .kit import TimeBarKit, TickBarKit, VolumeBarKit, DollarBarKit, CUSUMBarKit
from .data_model import TradesData, FootprintData

__all__ = [
    "TimeBarKit",
    "TickBarKit",
    "VolumeBarKit",
    "DollarBarKit",
    "CUSUMBarKit",
    "TradesData",
    "FootprintData",
]

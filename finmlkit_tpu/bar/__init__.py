from .kit import (TimeBarKit, TickBarKit, VolumeBarKit, DollarBarKit,
                  CUSUMBarKit, ImbalanceBarKit, RunBarKit)
from .data_model import TradesData, FootprintData

__all__ = [
    "TimeBarKit",
    "TickBarKit",
    "VolumeBarKit",
    "DollarBarKit",
    "CUSUMBarKit",
    "ImbalanceBarKit",
    "RunBarKit",
    "TradesData",
    "FootprintData",
]

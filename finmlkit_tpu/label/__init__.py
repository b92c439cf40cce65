from .tbm import triple_barrier
from .weights import (
    average_uniqueness,
    return_attribution,
    time_decay,
    class_balance_weights,
)
from .kit import TBMLabel, SampleWeights

__all__ = [
    "triple_barrier",
    "average_uniqueness",
    "return_attribution",
    "time_decay",
    "class_balance_weights",
    "TBMLabel",
    "SampleWeights",
]

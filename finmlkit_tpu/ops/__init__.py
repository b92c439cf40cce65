from .segment import (
    range_sum,
    range_count,
    bar_ids_from_close_indices,
    segment_max_ranges,
    segment_min_ranges,
    sorted_segments,
    segment_quantile_sorted,
    segment_median_sorted,
)
from .scan import linear_recurrence, padded_to_bucket

__all__ = [
    "range_sum",
    "range_count",
    "bar_ids_from_close_indices",
    "segment_max_ranges",
    "segment_min_ranges",
    "sorted_segments",
    "segment_quantile_sorted",
    "segment_median_sorted",
    "linear_recurrence",
    "padded_to_bucket",
]

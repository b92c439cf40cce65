from .filters import cusum_filter

__all__ = ["cusum_filter"]

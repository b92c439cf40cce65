from .kit import Feature, Compose, FeatureKit
from . import transforms
from . import kernels

__all__ = ["Feature", "Compose", "FeatureKit", "transforms", "kernels"]

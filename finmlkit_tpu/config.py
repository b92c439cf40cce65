"""Runtime configuration.

``feature_dtype()`` picks the working float precision for the bar-level
feature kernels: float64 off-TPU (exact parity with the pandas/f64
reference, used by the CPU test suite) and float32 on TPU, where f64
arithmetic compiles pathologically slowly (see bar/aggregate_q.py).
Override with ``set_feature_dtype``.
"""
import jax
import jax.numpy as jnp

_FEATURE_DTYPE = None


def set_feature_dtype(dtype):
    """Force the feature-kernel float dtype (None = auto per backend)."""
    global _FEATURE_DTYPE
    _FEATURE_DTYPE = None if dtype is None else jnp.dtype(dtype)


def feature_dtype():
    if _FEATURE_DTYPE is not None:
        return _FEATURE_DTYPE
    return jnp.float32 if jax.default_backend() == "tpu" else jnp.float64

"""FinMLKit-TPU: a TPU-native financial ML data-engineering framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the FinMLKit
reference library (quantscious/finmlkit): raw-trades preprocessing, bar
construction (time/tick/volume/dollar/CUSUM), intra-bar footprint features,
a composable bar-level feature framework, CUSUM event sampling,
triple-barrier labeling and AFML sample weights.

Where the reference uses Numba ``@njit`` CPU kernels, this package uses
XLA-compiled JAX programs and Pallas TPU kernels:

- per-bar/per-event ``prange`` loops   -> segment reductions over a fixed
  trade axis (prefix-sum differences + sorted-segment order statistics)
- inherently sequential scans          -> associative scans for linear
  recurrences; blockwise "event-jump" while-loops for threshold resets
- process-level parallelism            -> ``jax.sharding`` over a device
  mesh with carry/halo exchange between time shards

float64 note: the reference computes prices and log-returns in float64.
TPUs emulate f64; we enable ``jax_enable_x64`` on import (opt out with
``FMKT_DISABLE_X64=1``) and keep exact integer arithmetic on the bar
boundary-critical paths wherever possible.
"""
import os

import jax

if os.environ.get("FMKT_DISABLE_X64", "0") != "1":
    jax.config.update("jax_enable_x64", True)

from ._version import __version__  # noqa: E402

__all__ = ["__version__"]

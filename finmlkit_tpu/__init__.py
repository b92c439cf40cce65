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

# persistent XLA compilation cache: first compiles of the fused programs
# cost seconds-to-minutes on remote-compile TPU transports; a local cache
# makes every later process start warm. FMKT_COMPILE_CACHE overrides the
# location ("0" disables; unset -> ~/.cache/finmlkit_tpu/jax).
#
# NOTE: this is a process-global jax.config side effect — co-resident JAX
# code in the same process shares the cache dir (documented in README).
# The 0.05 s compile-time floor keeps trivial programs from growing the
# on-disk cache unboundedly AND avoids serializing the fast-compiling
# CPU variants of the big fused programs — XLA:CPU AOT serialization of
# the final-readback pipeline program SEGFAULTS (jax 0.01-floor
# experiment, round 5); every real device program compiles well above
# the floor.
def _machine_tag() -> str:
    """Cache entries are machine-specific: XLA:CPU AOT executables
    compiled on a host with different CPU features SEGFAULT when loaded
    (observed: a cache shared across driver hosts crashed the test
    suite inside ``compilation_cache.get_executable_and_time``). Key the
    directory by a fingerprint of the CPU flags."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        import platform as _platform
        flags = _platform.processor() or _platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


_cache = os.environ.get("FMKT_COMPILE_CACHE")
if _cache != "0":
    if not _cache:
        _cache = os.path.join(os.path.expanduser("~"), ".cache",
                              "finmlkit_tpu", "jax-" + _machine_tag())
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass

from ._version import __version__  # noqa: E402

__all__ = ["__version__"]

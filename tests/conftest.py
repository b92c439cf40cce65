"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual CPU mesh
(xla_force_host_platform_device_count) standing in for a TPU pod slice,
per the multi-host test strategy in SURVEY.md §4.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# no persistent compile cache under CI: XLA:CPU AOT serialization
# SEGFAULTS for some of the big fused programs (round-5 finding; the
# cache is a TPU-transport optimization anyway)
os.environ["FMKT_COMPILE_CACHE"] = "0"

# sitecustomize imports jax at interpreter startup (latching JAX_PLATFORMS
# from the shell, which presets the TPU backend) — override via config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def generate_trades(n=5000, seed=0, start="2024-03-01", freq_ms=150.0,
                    price0=100.0, sigma=2e-4, same_ts_frac=0.05):
    """GBM price path with exponential inter-arrival times (mirrors the
    role of tests/utils.py:36-81 in the reference test suite)."""
    r = np.random.default_rng(seed)
    dt = r.exponential(freq_ms, n) * 1e6  # ns
    dup = r.random(n) < same_ts_frac
    dt[dup] = 0.0
    ts = pd.Timestamp(start).value + np.cumsum(dt).astype(np.int64)
    rets = r.normal(0, sigma, n)
    price = price0 * np.exp(np.cumsum(rets))
    price = np.round(price, 2)
    amount = np.round(r.lognormal(-2.5, 1.2, n), 5).astype(np.float32)
    amount = np.maximum(amount, np.float32(1e-5))
    side = np.sign(r.normal(size=n)).astype(np.int8)
    side[side == 0] = 1
    return ts, price, amount, side


@pytest.fixture
def trades_small():
    return generate_trades(n=5000, seed=1)


@pytest.fixture
def trades_tiny():
    return generate_trades(n=300, seed=2)

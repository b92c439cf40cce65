"""Pallas prefix-scan kernel tests (interpret mode on CPU; the same
kernel code runs compiled on TPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from finmlkit_tpu.ops.pallas_scan import fast_cumsum


class TestFastCumsum:
    @pytest.mark.parametrize("n", [1, 100, 8192, 20000])
    def test_int32(self, n, rng):
        x = (rng.random(n) * 1000 - 500).astype(np.int32)
        got = np.asarray(fast_cumsum(jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(got, np.cumsum(x))

    @pytest.mark.parametrize("n", [100, 20000])
    def test_int64(self, n, rng):
        x = (rng.random(n) * 1e15 - 5e14).astype(np.int64)
        got = np.asarray(fast_cumsum(jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(got, np.cumsum(x))

    def test_int64_wraparound(self):
        x = np.full(2000, 2**62, dtype=np.int64)
        got = np.asarray(fast_cumsum(jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(got, np.cumsum(x))  # wraps identically

    def test_int64_negative_mix(self, rng):
        x = (rng.random(5000) * 2 - 1)
        x = (x * 2**40).astype(np.int64)
        got = np.asarray(fast_cumsum(jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(got, np.cumsum(x))

    def test_float32(self, rng):
        x = rng.random(20000).astype(np.float32)
        got = np.asarray(fast_cumsum(jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(got, np.cumsum(x.astype(np.float64)),
                                   rtol=2e-4)

    def test_cpu_fallback(self, rng):
        # with interpret=None on CPU, falls back to jnp.cumsum
        x = (rng.random(100) * 10).astype(np.int32)
        got = np.asarray(fast_cumsum(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.cumsum(x))

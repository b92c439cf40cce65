"""Native host boundary scans vs the device indexers: the C++ kernels
(seg_stats.cpp) must produce identical close indices to the vectorized
device scans for volume/dollar/CUSUM bars. Dyadic amounts/prices make
f64 sums exact so comparisons are bit-reproducible."""
import jax.numpy as jnp
import numpy as np
import pytest

from finmlkit_tpu import native
from finmlkit_tpu.bar import indexers

from tests.conftest import generate_trades

pytestmark = pytest.mark.skipif(native.lib() is None,
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def trades():
    ts, price, amount, side = generate_trades(n=6000, seed=17)
    r = np.random.default_rng(6)
    amount = (r.integers(1, 512, len(ts)) / 64.0).astype(np.float32)
    price = np.round(price * 16.0) / 16.0
    return ts, price, amount, side


@pytest.mark.parametrize("threshold", [40.0, 333.0])
def test_volume_host_vs_device(trades, threshold):
    ts, _, amount, _ = trades
    close_h, ci_h = indexers.volume_bar_indexer_host(ts, amount, threshold)
    _, ci_d = indexers.volume_bar_indexer(jnp.asarray(ts),
                                          jnp.asarray(amount), threshold)
    np.testing.assert_array_equal(ci_h, np.asarray(ci_d))
    np.testing.assert_array_equal(close_h, ts[ci_h])


@pytest.mark.parametrize("threshold", [15_000.0, 222_222.0])
def test_dollar_host_vs_device(trades, threshold):
    ts, price, amount, _ = trades
    close_h, ci_h = indexers.dollar_bar_indexer_host(ts, price, amount,
                                                     threshold)
    _, ci_d = indexers.dollar_bar_indexer(jnp.asarray(ts),
                                          jnp.asarray(price),
                                          jnp.asarray(amount), threshold)
    np.testing.assert_array_equal(ci_h, np.asarray(ci_d))


def test_cusum_host_vs_device(trades):
    ts, price, _, _ = trades
    n = len(ts)
    r = np.random.default_rng(12)
    sigma = np.abs(r.normal(2e-4, 5e-5, n))
    sigma[:40] = np.nan
    host = indexers.cusum_bar_indexer_host(ts, price, sigma, 1e-4, 2.0)
    assert host is not None
    close_h, ci_h, sig_h = host
    close_d, ci_d, sig_d = indexers.cusum_bar_indexer(
        jnp.asarray(ts), jnp.asarray(price), jnp.asarray(sigma), 1e-4, 2.0)
    np.testing.assert_array_equal(ci_h, np.asarray(ci_d))
    np.testing.assert_allclose(sig_h, np.asarray(sig_d), rtol=0, atol=0)


def test_first_trade_contribution():
    """The running totals must include trade 0 (reference seeds
    cum = volumes[0] / prices[0]*volumes[0])."""
    ts = (np.arange(5) * 1_000_000_000 + 1_700_000_000_000_000_000).astype(np.int64)
    vol = np.array([3.0, 3.0, 1.0, 1.0, 1.0], np.float32)
    # threshold 5: cum after trade 1 = 6 >= 5 -> boundary at 1 (only if
    # trade 0's 3.0 counts; otherwise the first boundary shifts to 2)
    _, ci = indexers.volume_bar_indexer_host(ts, vol, 5.0)
    assert ci[1] == 1
    price = np.array([2.0, 2.0, 2.0, 2.0, 2.0])
    # dollars: 6,6,2,2,2; threshold 10 -> cum: 6,12 -> boundary at 1
    _, ci_d = indexers.dollar_bar_indexer_host(ts, price, vol, 10.0)
    assert ci_d[1] == 1


def test_kits_use_native_path(trades):
    """VolumeBarKit / DollarBarKit / CUSUMBarKit boundaries flow from the
    native host scans (parity with device already asserted above)."""
    import pandas as pd
    from finmlkit_tpu.bar import (CUSUMBarKit, DollarBarKit, TradesData,
                                  VolumeBarKit)
    ts, price, amount, side = trades
    ids = np.arange(len(ts), dtype=np.int64)
    td = TradesData(ts, price, amount, ids, timestamp_unit="ns",
                    preprocess=False)
    td.data["side"] = side

    kit = VolumeBarKit(td, 100.0)
    ci_kit = kit.bar_close_indices
    _, ci_h = indexers.volume_bar_indexer_host(ts, amount, 100.0)
    np.testing.assert_array_equal(ci_kit, ci_h[1:])

    kit = DollarBarKit(td, 30_000.0)
    _, ci_h = indexers.dollar_bar_indexer_host(ts, price, amount, 30_000.0)
    np.testing.assert_array_equal(kit.bar_close_indices, ci_h[1:])

    sigma = np.full(len(ts), 2e-4)
    kit = CUSUMBarKit(td, sigma, sigma_floor=1e-4, sigma_mult=2.0)
    host = indexers.cusum_bar_indexer_host(ts, price, sigma, 1e-4, 2.0)
    np.testing.assert_array_equal(kit.bar_close_indices, host[1][1:])

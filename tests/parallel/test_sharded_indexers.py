"""Bit-exact parity of the mesh bar indexers vs the single-device ones.

All seven bar types (time/tick/volume/dollar/CUSUM/imbalance/run) run on
the 8-device virtual CPU mesh (conftest) and must reproduce the exact
single-device close indices — the carry-exchange correctness test from
SURVEY.md §7 (volume reset base, dollar remainder prefix, CUSUM s+/s-,
info-bar EMA state). Dyadic-rational volumes/prices make the f64 sums
exact so float paths are bit-reproducible too.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from finmlkit_tpu.bar import indexers  # noqa: E402
from finmlkit_tpu.parallel import sharded_indexers as si  # noqa: E402
from finmlkit_tpu.parallel.mesh import time_mesh  # noqa: E402

from tests.conftest import generate_trades  # noqa: E402


@pytest.fixture(scope="module")
def mesh():
    return time_mesh(8)


@pytest.fixture(scope="module")
def trades():
    ts, price, amount, side = generate_trades(n=6000, seed=7)
    # dyadic volumes (k/64) and prices (k/16): f64 sums are exact, so
    # float-path boundaries are bit-reproducible under re-association
    r = np.random.default_rng(3)
    amount = (r.integers(1, 512, len(ts)) / 64.0).astype(np.float64)
    price = np.round(price * 16.0) / 16.0
    return ts, price, amount, side


def test_time_bars(trades, mesh):
    ts, *_ = trades
    clock_s, ci_s = si.sharded_time_bar_indexer(ts, 60.0, mesh)
    clock_1, ci_1 = indexers.time_bar_indexer(jnp.asarray(ts), 60.0,
                                              ts_first=int(ts[0]),
                                              ts_last_i=int(ts[-1]))
    np.testing.assert_array_equal(clock_s, np.asarray(clock_1))
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))


def test_tick_bars(trades, mesh):
    ts, *_ = trades
    _, ci_s = si.sharded_tick_bar_indexer(ts, 700, mesh)
    _, ci_1 = indexers.tick_bar_indexer(jnp.asarray(ts), 700)
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))


@pytest.mark.parametrize("threshold", [50.0, 333.0, 5.0])
def test_volume_bars_f64(trades, mesh, threshold):
    ts, _, amount, _ = trades
    _, ci_s = si.sharded_volume_bar_indexer(ts, amount, threshold, mesh)
    _, ci_1 = indexers.volume_bar_indexer(jnp.asarray(ts),
                                          jnp.asarray(amount), threshold)
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))


def test_volume_bars_quantized(trades, mesh):
    ts, _, amount, _ = trades
    units = np.round(amount * 64).astype(np.int64)
    scale = 1.0 / 64.0
    _, ci_s = si.sharded_volume_bar_indexer(
        ts, None, 100.0, mesh, amount_units=units, amount_scale=scale)
    _, ci_1 = indexers.volume_bar_indexer_q(jnp.asarray(ts),
                                            jnp.asarray(units), 100.0, scale)
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))


@pytest.mark.parametrize("threshold", [10_000.0, 123_456.0])
def test_dollar_bars_f64(trades, mesh, threshold):
    ts, price, amount, _ = trades
    _, ci_s = si.sharded_dollar_bar_indexer(ts, price, amount, threshold, mesh)
    _, ci_1 = indexers.dollar_bar_indexer(jnp.asarray(ts), jnp.asarray(price),
                                          jnp.asarray(amount), threshold)
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))


def test_dollar_bars_quantized(trades, mesh):
    ts, price, amount, _ = trades
    ticks = np.round(price * 16).astype(np.int32)
    units = np.round(amount * 64).astype(np.int64)
    tick_size, scale = 1.0 / 16.0, 1.0 / 64.0
    _, ci_s = si.sharded_dollar_bar_indexer(
        ts, None, None, 20_000.0, mesh, price_ticks=ticks,
        amount_units=units, tick_size=tick_size, amount_scale=scale)
    _, ci_1 = indexers.dollar_bar_indexer_q(
        jnp.asarray(ts), jnp.asarray(ticks), jnp.asarray(units), 20_000.0,
        tick_size, scale)
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))


def test_cusum_bars(trades, mesh):
    ts, price, _, _ = trades
    n = len(ts)
    r = np.random.default_rng(11)
    sigma = np.abs(r.normal(2e-4, 5e-5, n))
    sigma[:50] = np.nan  # leading-NaN forward-fill across the first shard
    sigma[800:820] = np.nan  # interior NaN run
    close_s, ci_s, sig_s = si.sharded_cusum_bar_indexer(
        ts, price, sigma, 1e-4, 2.0, mesh)
    close_1, ci_1, sig_1 = indexers.cusum_bar_indexer(
        jnp.asarray(ts), jnp.asarray(price), jnp.asarray(sigma), 1e-4, 2.0)
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))
    np.testing.assert_array_equal(close_s, np.asarray(close_1))
    np.testing.assert_allclose(sig_s, np.asarray(sig_1), rtol=0, atol=0)


def test_imbalance_bars_tick_mode(trades, mesh):
    ts, _, _, side = trades
    _, ci_s = si.sharded_imbalance_bar_indexer(ts, side, threshold=40.0,
                                               mesh=mesh)
    _, ci_1 = indexers.imbalance_bar_indexer(jnp.asarray(ts),
                                             jnp.asarray(side),
                                             threshold=40.0)
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))


def test_imbalance_bars_volume_ema(trades, mesh):
    ts, _, amount, side = trades
    kw = dict(expected_ticks_init=200.0, expected_rate_init=2.0,
              alpha_ticks=0.1, alpha_rate=0.05)
    _, ci_s = si.sharded_imbalance_bar_indexer(ts, side, amount, mesh=mesh,
                                               **kw)
    _, ci_1 = indexers.imbalance_bar_indexer(jnp.asarray(ts),
                                             jnp.asarray(side),
                                             jnp.asarray(amount), **kw)
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))


def test_run_bars(trades, mesh):
    ts, _, amount, side = trades
    _, ci_s = si.sharded_run_bar_indexer(ts, side, amount, threshold=300.0,
                                         mesh=mesh)
    _, ci_1 = indexers.run_bar_indexer(jnp.asarray(ts), jnp.asarray(side),
                                       jnp.asarray(amount), threshold=300.0)
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))


def test_straddling_and_empty_shards(mesh):
    """A bar spanning several shards and shards with no boundary at all."""
    n = 64
    ts = (1_700_000_000_000_000_000 + np.arange(n) * 1_000_000_000).astype(np.int64)
    amount = np.full(n, 0.25)
    # threshold so large only two boundaries exist -> most shards carry
    _, ci_s = si.sharded_volume_bar_indexer(ts, amount, 6.0, mesh)
    _, ci_1 = indexers.volume_bar_indexer(jnp.asarray(ts), jnp.asarray(amount), 6.0)
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))
    assert len(ci_s) >= 3


def test_fewer_trades_than_would_fill_shards(mesh):
    n = 21  # not divisible by 8; heavy padding on the tail shards
    ts = (1_700_000_000_000_000_000 + np.arange(n) * 500_000_000).astype(np.int64)
    amount = np.full(n, 1.0)
    _, ci_s = si.sharded_volume_bar_indexer(ts, amount, 4.0, mesh)
    _, ci_1 = indexers.volume_bar_indexer(jnp.asarray(ts), jnp.asarray(amount), 4.0)
    np.testing.assert_array_equal(ci_s, np.asarray(ci_1))

"""Mesh footprints / rolling volume profile vs the single-device kernels.

The scatter shards by trade range (psum of partial dense tensors) and
the window aggregation uses a ppermute bar-halo — both must reproduce
the single-device results exactly (integer tick grids; f64 volume sums
differ only by psum re-association, tested with dyadic amounts for
bit-exactness).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from finmlkit_tpu.bar.footprint import comp_bar_footprints  # noqa: E402
from finmlkit_tpu.bar.indexers import time_bar_indexer  # noqa: E402
from finmlkit_tpu.bar import aggregate  # noqa: E402
from finmlkit_tpu.feature.kernels.volume import volume_profile_rolling  # noqa: E402
from finmlkit_tpu.parallel import shard_trades, time_mesh  # noqa: E402
from finmlkit_tpu.parallel.sharded_footprint import (  # noqa: E402
    sharded_bar_footprints, sharded_volume_profile_rolling)

from tests.conftest import generate_trades  # noqa: E402


@pytest.fixture(scope="module")
def mesh():
    return time_mesh(8)


@pytest.fixture(scope="module")
def setup():
    ts, price, amount, side = generate_trades(n=4000, seed=21)
    r = np.random.default_rng(4)
    amount = (r.integers(1, 256, len(ts)) / 64.0).astype(np.float32)
    tick = 0.01
    n = len(ts)
    ci = np.asarray(time_bar_indexer(jnp.asarray(ts), 30.0,
                                     ts_first=int(ts[0]),
                                     ts_last_i=int(ts[-1]))[1])
    ohlcv = comp = aggregate.comp_bar_ohlcv(
        jnp.asarray(price), jnp.asarray(amount), jnp.asarray(ci))
    lows = np.asarray(comp["low"])
    highs = np.asarray(comp["high"])
    return ts, price, amount, side, ci, lows, highs, tick


def test_footprints_match_single_device(setup, mesh):
    ts, price, amount, side, ci, lows, highs, tick = setup
    n = len(ts)
    max_levels = int(2 ** np.ceil(np.log2(
        (np.round(highs / tick) - np.round(lows / tick) + 1).max())))

    single = comp_bar_footprints(
        jnp.asarray(price), jnp.asarray(amount), jnp.asarray(ci),
        jnp.asarray(side), tick, jnp.asarray(lows), jnp.asarray(highs),
        3.0, max_levels=max_levels)

    sharded = shard_trades(
        {"price": price, "amount": amount, "side": side}, mesh)
    out = sharded_bar_footprints(sharded, ci, lows, highs, tick, 3.0, mesh,
                                 max_levels=max_levels, n=n)

    for k in single:
        s, d = np.asarray(single[k]), np.asarray(out[k])
        if s.dtype.kind == "f":
            np.testing.assert_allclose(d, s, rtol=1e-9, atol=1e-9,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(d, s, err_msg=k)


def test_volume_profile_rolling_halo(setup, mesh):
    ts, price, amount, side, ci, lows, highs, tick = setup
    n = len(ts)
    max_levels = 128
    fp = comp_bar_footprints(
        jnp.asarray(price), jnp.asarray(amount), jnp.asarray(ci),
        jnp.asarray(side), tick, jnp.asarray(lows), jnp.asarray(highs),
        3.0, max_levels=max_levels)
    bar_ts = ts[np.asarray(ci)[1:]]

    for window in (120.0, 600.0):  # halo within one shard and across many
        poc1, hva1, lva1, pct1 = [np.asarray(x) for x in volume_profile_rolling(
            bar_ts, fp["low_level"], fp["n_levels"], fp["buy_volumes"],
            fp["sell_volumes"], window)]
        poc2, hva2, lva2, pct2 = sharded_volume_profile_rolling(
            bar_ts, np.asarray(fp["low_level"]), np.asarray(fp["n_levels"]),
            np.asarray(fp["buy_volumes"]), np.asarray(fp["sell_volumes"]),
            window, mesh)
        np.testing.assert_array_equal(poc2, poc1)
        np.testing.assert_array_equal(hva2, hva1)
        np.testing.assert_array_equal(lva2, lva1)
        np.testing.assert_allclose(pct2, pct1, rtol=1e-6)

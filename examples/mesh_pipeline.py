"""Sharded pipeline demo: boundary discovery + bar products on a mesh.

Runs the distributed slice of the framework on a virtual 8-device CPU
mesh (no pod required) and checks bit-exactness against the
single-device path:

    python examples/mesh_pipeline.py

On real multi-chip hardware the identical code scales across ICI — the
mesh comes from ``jax.devices()`` and XLA inserts the collectives.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def synth(n=80_000, seed=3):
    r = np.random.default_rng(seed)
    dt = (r.exponential(90.0, n) * 1e6).astype(np.int64)
    ts = 1_700_000_000_000_000_000 + np.cumsum(dt)
    price = np.round(30_000 * np.exp(np.cumsum(r.normal(0, 3e-5, n))), 1)
    amount = np.maximum(np.round(r.lognormal(-3, 1.3, n), 5),
                        1e-5).astype(np.float32)
    side = np.where(r.random(n) < 0.5, 1, -1).astype(np.int8)
    return ts, price, amount, side


def main():
    from finmlkit_tpu.bar.indexers import time_bar_indexer, volume_bar_indexer
    from finmlkit_tpu.parallel import (shard_trades, sharded_bar_products,
                                       time_mesh)
    from finmlkit_tpu.parallel import sharded_indexers as si

    import jax.numpy as jnp

    mesh = time_mesh()
    n_dev = mesh.shape["t"]
    ts, price, amount, side = synth()
    print(f"mesh: {n_dev} devices; trades: {len(ts):,}")

    # --- boundary discovery ON the mesh ---------------------------------
    _, ci_mesh = si.sharded_time_bar_indexer(ts, 60.0, mesh)
    _, ci_one = time_bar_indexer(jnp.asarray(ts), 60.0,
                                 ts_first=int(ts[0]), ts_last_i=int(ts[-1]))
    assert np.array_equal(np.asarray(ci_mesh), np.asarray(ci_one)), \
        "mesh time indexer must be bit-exact"
    print(f"time bars: {len(np.asarray(ci_mesh)) - 1:,} (mesh == single ✓)")

    thr = float(amount.sum()) / 500.0
    _, civ_mesh = si.sharded_volume_bar_indexer(
        ts, amount.astype(np.float64), thr, mesh)
    _, civ_one = volume_bar_indexer(jnp.asarray(ts), jnp.asarray(amount),
                                    thr)
    assert np.array_equal(np.asarray(civ_mesh), np.asarray(civ_one)), \
        "mesh volume indexer must be bit-exact (ring carry exchange)"
    print(f"volume bars: {len(np.asarray(civ_mesh)) - 1:,} "
          f"(carry-exchange parity ✓)")

    # --- bar products across the mesh -----------------------------------
    sharded = shard_trades(
        {"price": price, "amount": amount, "side": side}, mesh)
    out = sharded_bar_products(sharded, jnp.asarray(np.asarray(ci_mesh)),
                               mesh)
    jax.block_until_ready(out)
    close = np.asarray(out["close"])
    vol = np.asarray(out["volume"])
    print(f"products on mesh: {len(close):,} bars, "
          f"total volume {vol.sum():,.2f} (== {amount.sum():,.2f})")
    assert abs(float(vol.sum()) - float(amount.sum())) < 1e-2 * amount.sum()

    print("mesh pipeline ok")


if __name__ == "__main__":
    main()

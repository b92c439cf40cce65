"""Multi-host ingestion demo: monthly H5 store -> sharded mesh pipeline.

End-to-end analog of the reference's process-parallel month loading
feeding compute (/root/reference/finmlkit/bar/data_model.py:689-732),
mapped onto the TPU mesh path:

1. build a monthly-partitioned trade store (3 synthetic months);
2. ``load_store_to_mesh``: every host loads ONLY the months overlapping
   its contiguous row span (from /meta record counts — no data reads for
   planning) and places its rows directly on its addressable devices via
   ``jax.make_array_from_callback`` — the full trade stream is never
   gathered anywhere;
3. boundary discovery ON the mesh (sharded time-bar indexer);
4. shard_map bar products with cross-shard carry exchange;
5. parity check vs the single-device aggregation path.

Runs on the virtual 8-device CPU mesh in this environment; on a real
multi-host pod the same code path uses jax.distributed process indices
(each host loads its own span) and ICI collectives.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multihost_ingest.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def build_store(path: str, months: int = 3, n_per_month: int = 40_000) -> str:
    from finmlkit_tpu.bar import TradesData

    r = np.random.default_rng(42)
    base = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64)
    for m in range(months):
        start = base + m * 31 * 24 * 3600 * 1_000_000_000
        ts = (start + np.sort(
            r.integers(0, 28 * 24 * 3600 * 1_000_000_000, n_per_month))
        ).astype(np.int64)
        px = np.round(100 + r.normal(0, 0.3, n_per_month).cumsum() * 0.01, 2)
        amt = np.round(r.lognormal(-2, 1, n_per_month), 5).astype(np.float32)
        ids = np.arange(m * n_per_month, (m + 1) * n_per_month,
                        dtype=np.int64)
        TradesData(ts, px, amt, ids, timestamp_unit="ns",
                   preprocess=True).save_h5(path)
    return path


def main():
    import jax

    if jax.default_backend() != "cpu" and len(jax.devices()) < 2:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from finmlkit_tpu.bar import aggregate
    from finmlkit_tpu.parallel import (load_store_to_mesh,
                                       sharded_bar_products, time_mesh)
    from finmlkit_tpu.parallel import sharded_indexers as si

    devices = jax.devices("cpu") if jax.default_backend() != "cpu" \
        else jax.devices()
    mesh = time_mesh(devices=devices[:8])
    n_dev = mesh.shape["t"]

    with tempfile.TemporaryDirectory() as tmp:
        store = build_store(os.path.join(tmp, "trades.h5"))

        # --- 2. store -> mesh, no full-stream gather ------------------
        sharded, n, local_cols = load_store_to_mesh(store, mesh)
        print(f"ingested {n:,} trades over {n_dev} devices "
              f"({jax.process_count()} host process(es))")
        for name, arr in sharded.items():
            shard_rows = {str(s.device): s.data.shape[0]
                          for s in arr.addressable_shards}
            n_shards = len(set(shard_rows))
            sizes = sorted(set(shard_rows.values()))
            print(f"  {name}: global {arr.shape[0]:,} rows, "
                  f"{n_shards} device shards of {sizes} rows each")
            assert all(v == arr.shape[0] // n_dev for v in shard_rows.values()), \
                "every device holds exactly its 1/N row span"

        # --- 3. boundary discovery on the mesh ------------------------
        ts_host = local_cols["timestamp"]  # this host's span (demo: all)
        _, ci = si.sharded_time_bar_indexer(np.asarray(ts_host), 3600.0, mesh)
        print(f"sharded time indexer: {len(ci) - 1:,} hourly bars")

        # --- 4. shard_map bar products with carry exchange ------------
        out = sharded_bar_products(
            {"price": sharded["price"], "amount": sharded["amount"],
             "side": sharded["side"]}, jnp.asarray(ci), mesh)
        jax.block_until_ready(out)

        # --- 5. parity vs the single-device path ----------------------
        ref = aggregate.comp_bar_ohlcv(
            jnp.asarray(local_cols["price"]),
            jnp.asarray(local_cols["amount"].astype(np.float64)),
            jnp.asarray(ci))
        for k in ("open", "high", "low", "close", "volume"):
            np.testing.assert_allclose(
                np.asarray(out[k], np.float64),
                np.asarray(ref[k], np.float64), rtol=1e-6, atol=1e-9,
                err_msg=k)
        print("parity vs single-device aggregation: OK "
              "(open/high/low/close/volume)")
        print("multihost_ingest demo ok")


if __name__ == "__main__":
    main()

"""Scaling-efficiency harness for the time-sharded bar pipeline.

Runs the shard_map bar products over meshes of 1..N devices and reports
throughput + scaling efficiency. On this single-chip dev environment it
runs on the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N)
to validate the sharding/collective structure; on a real pod slice the
same code path exercises ICI collectives.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/scaling_bench.py [n_trades]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # sitecustomize re-latches JAX_PLATFORMS after process start; pin
        # the CPU backend explicitly (see .claude/skills/verify/SKILL.md)
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "tpu" and len(jax.devices()) < 2:
        print("# need multiple devices; set "
              "XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu",
              file=sys.stderr)

    import jax.numpy as jnp
    from finmlkit_tpu.bar.indexers import time_bar_indexer
    from finmlkit_tpu.parallel import time_mesh, shard_trades, sharded_bar_products

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    r = np.random.default_rng(0)
    dt = (r.exponential(70.0, n) * 1e6).astype(np.int64)
    ts = 1_700_000_000_000_000_000 + np.cumsum(dt)
    price = np.round(100.0 * np.exp(np.cumsum(r.normal(0, 1e-4, n))), 2)
    amount = np.maximum(np.round(r.lognormal(-2.5, 1.2, n), 5), 1e-5).astype(np.float32)
    side = np.where(r.random(n) < 0.5, 1, -1).astype(np.int8)

    _, ci = time_bar_indexer(jnp.asarray(ts), 60.0,
                             ts_first=int(ts[0]), ts_last_i=int(ts[-1]))
    ci = jax.block_until_ready(ci)

    all_devices = jax.devices()
    sizes = [d for d in (1, 2, 4, 8) if d <= len(all_devices)]
    results = {}
    for nd in sizes:
        mesh = time_mesh(devices=all_devices[:nd])
        sharded = shard_trades(
            {"price": price.astype(np.float64), "amount": amount,
             "side": side}, mesh)
        out = sharded_bar_products(sharded, ci, mesh)   # compile + run
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = sharded_bar_products(sharded, ci, mesh)
        # force completion via a small readback
        np.asarray(out["volume"][:1])
        dt_s = (time.time() - t0) / reps
        results[nd] = n / dt_s
        print(f"# {nd} device(s): {results[nd]:,.0f} trades/s "
              f"({dt_s*1000:.1f} ms)", file=sys.stderr)

    # --- sharded indexer layer (boundary discovery ON the mesh) ---
    from finmlkit_tpu.parallel import sharded_indexers as si
    idx_results = {}
    for nd in sizes:
        mesh = time_mesh(devices=all_devices[:nd])
        si.sharded_time_bar_indexer(ts, 60.0, mesh)  # compile
        t0 = time.time()
        _, ci_s = si.sharded_time_bar_indexer(ts, 60.0, mesh)
        dt_s = time.time() - t0
        idx_results[nd] = n / dt_s
        print(f"# sharded time indexer @ {nd} dev: {idx_results[nd]:,.0f} "
              f"trades/s", file=sys.stderr)
    assert np.array_equal(ci_s, np.asarray(ci)), "mesh indexer parity"

    if jax.default_backend() != "tpu":
        print("# NOTE: virtual CPU devices share the same physical cores — "
              "this validates the sharding/collective structure, not real "
              "scaling; run on a pod slice for meaningful efficiency.",
              file=sys.stderr)
    base = results[sizes[0]]
    effs = {nd: results[nd] / (base * nd) for nd in sizes}
    for nd in sizes:
        print(f"# scaling efficiency @ {nd} dev: {effs[nd]*100:.1f}%",
              file=sys.stderr)

    # --- device-work + collective-byte analysis (VERDICT r3 #7) -------
    # Wall-clock on the virtual CPU mesh is meaningless (N virtual
    # devices share the host cores), so scaling is *predicted* from the
    # compiled program itself: per-device FLOPs/bytes from XLA's cost
    # model (should fall ~1/N for a scalable layout) and the exact
    # collective inventory (bytes ~ n_bars, INDEPENDENT of n — the ICI
    # term that bounds real-pod efficiency). Derivation in BENCH_NOTES.md.
    import re
    from functools import partial as _partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from finmlkit_tpu.parallel.sharded import _bar_partials

    _BYTES = {"f64": 8, "f32": 4, "s64": 8, "u64": 8, "s32": 4, "u32": 4,
              "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2}

    def _collectives(hlo_text):
        inv = {}
        pat = re.compile(
            r"(\w+)\[([\d,]*)\][^=]*\b"
            r"(all-reduce|all-gather|collective-permute|reduce-scatter|"
            r"all-to-all)\b")
        for m in pat.finditer(hlo_text):
            dt, dims, op = m.group(1), m.group(2), m.group(3)
            nbytes = _BYTES.get(dt, 4)
            for d in dims.split(","):
                if d:
                    nbytes *= int(d)
            key = op
            ent = inv.setdefault(key, {"count": 0, "bytes": 0})
            ent["count"] += 1
            ent["bytes"] += nbytes
        return inv

    analysis = {}
    for nd in sizes:
        mesh = time_mesh(devices=all_devices[:nd])
        sharded = shard_trades(
            {"price": price.astype(np.float64), "amount": amount,
             "side": side}, mesh)
        fn = shard_map(_partial(_bar_partials, axis_name="t"), mesh=mesh,
                       in_specs=(P("t"), P("t"), P("t"), P(None)),
                       out_specs=P(None), check_vma=False)
        compiled = jax.jit(fn).lower(
            sharded["price"], sharded["amount"], sharded["side"],
            jnp.asarray(np.asarray(ci), jnp.int64)).compile()
        ca = compiled.cost_analysis() or {}
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        entry = {
            "flops_per_device": float(ca.get("flops", -1.0)),
            "bytes_accessed_per_device": float(ca.get("bytes accessed",
                                                      -1.0)),
        }
        try:
            entry["collectives"] = _collectives(compiled.as_text())
        except Exception as e:  # noqa: BLE001
            entry["collectives"] = {"error": repr(e)}
        analysis[str(nd)] = entry
        print(f"# analysis @ {nd} dev: flops/dev={entry['flops_per_device']:.3e} "
              f"bytes/dev={entry['bytes_accessed_per_device']:.3e} "
              f"collectives={entry['collectives']}", file=sys.stderr)

    f1 = analysis[str(sizes[0])]["flops_per_device"]
    work_eff = {
        nd: round(f1 / (nd * analysis[str(nd)]["flops_per_device"]), 3)
        if analysis[str(nd)]["flops_per_device"] > 0 else None
        for nd in sizes}
    for nd in sizes:
        print(f"# device-work efficiency @ {nd} dev: {work_eff[nd]}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "sharded_bar_products_scaling",
        "environment": ("virtual-cpu-mesh structure validation"
                        if jax.default_backend() != "tpu" else "tpu"),
        "n_trades": n,
        "trades_per_sec": {str(k): round(v) for k, v in results.items()},
        "efficiency_wallclock_virtual": {
            str(k): round(v, 3) for k, v in effs.items()},
        "efficiency_device_work": {str(k): v for k, v in work_eff.items()},
        "per_device_analysis": analysis,
        "sharded_indexer_trades_per_sec": {
            str(k): round(v) for k, v in idx_results.items()},
        "note": "virtual CPU devices share host cores: wall-clock "
                "efficiency is NOT evidence; device-work efficiency and "
                "the n-independent collective byte counts are the "
                "pod-scaling predictors (see BENCH_NOTES.md)",
    }))


if __name__ == "__main__":
    main()

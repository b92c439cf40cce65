"""Multi-process month ingestion feeding the time mesh: process-parallel
month loads (reference data_model.py:689-732 analog) placed sharded on
the 8-device mesh must reproduce single-device bar products."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finmlkit_tpu.bar import TradesData, aggregate, indexers
from finmlkit_tpu.parallel import (load_store_to_mesh, month_plan,
                                   sharded_bar_products, time_mesh)


@pytest.fixture
def two_month_store(tmp_path):
    """A store with two monthly partitions (Jan + Feb 2024)."""
    r = np.random.default_rng(9)
    paths = str(tmp_path / "trades.h5")
    all_cols = []
    base = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64)
    n = 3000
    for m in range(2):
        start = base + m * 31 * 24 * 3600 * 1_000_000_000
        ts = (start + np.sort(r.integers(0, 25 * 24 * 3600 * 1_000_000_000, n))
              ).astype(np.int64)
        px = np.round(100 + r.normal(0, 0.3, n).cumsum() * 0.01, 2)
        amt = np.round(r.lognormal(-2, 1, n), 5).astype(np.float32)
        ids = np.arange(m * n, (m + 1) * n, dtype=np.int64)
        td = TradesData(ts, px, amt, ids, timestamp_unit="ns", preprocess=True)
        td.save_h5(paths)
        all_cols.append(td)
    return paths


class TestMonthPlan:
    def test_contiguous_preserves_order(self):
        months = ["2024-03", "2024-01", "2024-02", "2024-04"]
        plan = month_plan(months, 2)
        # contiguous spans (not round-robin): each host owns a time range
        assert plan == [["2024-01", "2024-02"], ["2024-03", "2024-04"]]
        assert month_plan(months, 1) == [sorted(months)]


class TestRowPlan:
    def test_spans_and_straddling_month(self):
        from finmlkit_tpu.parallel.ingest import row_plan
        counts = {"2024-01": 100, "2024-02": 50, "2024-03": 70}
        plans, spans = row_plan(counts, 2)
        assert spans == [(0, 110), (110, 220)]
        # process 0: Jan + the first 10 rows of Feb
        assert plans[0] == {"months": ["2024-01", "2024-02"],
                            "skip": 0, "take": 110}
        # process 1: the rest of Feb (skip its first 10 rows) + Mar —
        # the straddling month is the only duplicated I/O
        assert plans[1] == {"months": ["2024-02", "2024-03"],
                            "skip": 10, "take": 110}

    def test_memory_scalability(self):
        """No process's plan covers more rows than span + one month."""
        from finmlkit_tpu.parallel.ingest import row_plan
        r = np.random.default_rng(5)
        counts = {f"2024-{m:02d}": int(r.integers(10, 2000))
                  for m in range(1, 13)}
        for n_proc in (2, 3, 8):
            plans, spans = row_plan(counts, n_proc)
            for p, (lo, hi) in zip(plans, spans):
                # a span can straddle at most one month at each edge
                rows_loaded = sum(counts[m] for m in p["months"])
                assert rows_loaded <= (hi - lo) + 2 * max(counts.values())
                assert p["take"] == hi - lo
            # spans tile the stream
            assert spans[0][0] == 0
            for (_, b), (c, _) in zip(spans, spans[1:]):
                assert b == c

    def test_padded_total(self):
        from finmlkit_tpu.parallel.ingest import row_plan
        counts = {"2024-01": 13}
        plans, spans = row_plan(counts, 2, n_padded=16)
        assert spans == [(0, 8), (8, 16)]
        assert plans[0]["take"] == 8
        # the last span holds only 5 real rows; the other 3 are padding
        assert plans[1] == {"months": ["2024-01"], "skip": 8, "take": 5}


class TestLoadStoreToMesh:
    def test_products_match_single_device(self, two_month_store):
        mesh = time_mesh(8)
        sharded, n, cols = load_store_to_mesh(two_month_store, mesh,
                                              max_workers=2)
        assert n == len(cols["timestamp"])
        assert sorted(cols.keys()) >= ["amount", "price", "side", "timestamp"]
        # timestamps must be globally sorted (months concatenated in order)
        assert (np.diff(cols["timestamp"]) >= 0).all()

        ts = jnp.asarray(cols["timestamp"])
        _, ci = indexers.time_bar_indexer(ts, 3600.0)
        out = sharded_bar_products(sharded, ci, mesh)
        ref = aggregate.comp_bar_ohlcv(
            jnp.asarray(cols["price"]),
            jnp.asarray(cols["amount"], jnp.float32), ci)
        np.testing.assert_allclose(np.asarray(out["close"]),
                                   np.asarray(ref["close"]), rtol=1e-12)
        # vwap sums are combined with psum across shards; f64 addition is
        # not associative, so the reassociated sums differ from the
        # single-device cumsum by a few ulps (observed 4.3e-12 relative)
        np.testing.assert_allclose(np.asarray(out["vwap"]),
                                   np.asarray(ref["vwap"]), rtol=1e-9)
        np.testing.assert_array_equal(np.asarray(out["trades"]),
                                      np.asarray(ref["trades"]))

    def test_month_subset(self, two_month_store):
        mesh = time_mesh(8)
        import h5py
        with h5py.File(two_month_store, "r") as f:
            months = sorted(f["trades"].keys())
        assert len(months) == 2
        sharded, n, cols = load_store_to_mesh(
            two_month_store, mesh, months=months[:1], max_workers=1)
        # only January
        end_jan = np.datetime64("2024-02-01").astype("datetime64[ns]").astype(np.int64)
        assert cols["timestamp"].max() < end_jan

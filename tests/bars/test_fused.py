"""Fused single-pass bar pipeline (ops/fused_scan.py + bar/fused.py) vs
the f64 reference aggregation path — Pallas kernel in interpret mode on
CPU (the same kernel compiles natively on the TPU; see BENCH_NOTES.md)."""
import jax.numpy as jnp
import numpy as np
import pytest

from finmlkit_tpu.bar import aggregate, fused
from finmlkit_tpu.bar.quantize import quantize_trades


def _mk(n=6000, seed=3, zero_side_every=97, n_bars=70):
    r = np.random.default_rng(seed)
    price = np.round(100 + np.cumsum(r.normal(0, 0.05, n)), 2)
    amount = np.maximum(np.round(r.lognormal(-2.5, 1.2, n), 5),
                        1e-5).astype(np.float32)
    side = r.choice(np.array([-1, 1], np.int8), n)
    if zero_side_every:
        side[::zero_side_every] = 0
    q = quantize_trades(price, amount)
    assert q is not None
    ci = np.concatenate([
        [-1], np.sort(r.choice(np.arange(1, n - 1), n_bars, replace=False)),
        [n - 1]]).astype(np.int64)
    ci = np.unique(ci)
    # inject an empty bar (duplicate close index)
    ci = np.sort(np.concatenate([ci, [ci[5]]]))
    return price, amount, side, q, ci


@pytest.fixture(scope="module")
def case():
    price, amount, side, q, ci = _mk()
    ohlcv, direc = fused.bar_products_fused(
        jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
        jnp.asarray(ci), jnp.asarray(side), tick_size=q.tick_size,
        amount_scale=q.amount_scale, amounts_host=amount, ci_host=ci,
        interpret=True)
    ref_o = aggregate.comp_bar_ohlcv(jnp.asarray(price), jnp.asarray(amount),
                                     jnp.asarray(ci))
    ref_d = aggregate.comp_bar_directional_features(
        jnp.asarray(price), jnp.asarray(amount), jnp.asarray(ci),
        jnp.asarray(side))
    return ohlcv, direc, ref_o, ref_d


class TestFusedOHLCV:
    @pytest.mark.parametrize("key", ["open", "high", "low", "close",
                                     "volume", "vwap", "trades",
                                     "median_trade_size"])
    def test_matches_f64_reference(self, case, key):
        ohlcv, _, ref_o, _ = case
        np.testing.assert_allclose(
            np.asarray(ohlcv[key], np.float64),
            np.asarray(ref_o[key], np.float64), rtol=1e-6, atol=1e-9,
            err_msg=key)


class TestFusedDirectional:
    @pytest.mark.parametrize("key", [
        "ticks_buy", "ticks_sell", "volume_buy", "volume_sell",
        "dollars_buy", "dollars_sell", "mean_spread", "max_spread",
        "cum_ticks_min", "cum_ticks_max", "cum_volume_min",
        "cum_volume_max", "cum_dollars_min", "cum_dollars_max"])
    def test_matches_f64_reference(self, case, key):
        _, direc, _, ref_d = case
        a = np.asarray(direc[key], np.float64)
        b = np.asarray(ref_d[key], np.float64)
        m = np.isnan(b)
        assert (np.isnan(a) == m).all(), key
        # tolerance covers the 1e-8 amount-quantization accumulating
        # over in-bar sums plus the f32 storage of cv/cd extrema
        np.testing.assert_allclose(a[~m], b[~m], rtol=3e-5, atol=5e-6,
                                   err_msg=key)


class TestFusedMedianFallback:
    def test_device_sort_median_matches_native(self):
        price, amount, side, q, ci = _mk(n=3000, seed=9, n_bars=40)
        kw = dict(tick_size=q.tick_size, amount_scale=q.amount_scale,
                  interpret=True)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        o_native, _ = fused.bar_products_fused(
            *args, amounts_host=amount, ci_host=ci, **kw)
        o_sort, _ = fused.bar_products_fused(
            *args, amounts_f32=jnp.asarray(amount), **kw)
        np.testing.assert_allclose(o_sort["median_trade_size"],
                                   o_native["median_trade_size"], rtol=1e-6)


def test_one_dispatch_variant_matches():
    """The single-jit (one-dispatch) device path must equal the staged
    3-dispatch path exactly (same kernels, one compiled program)."""
    price, amount, side, q, ci = _mk(n=4000, seed=9, n_bars=40)
    import jax
    a = fused.fused_raw_device(jnp.asarray(q.price_ticks),
                               jnp.asarray(q.amount_units),
                               jnp.asarray(ci), jnp.asarray(side),
                               interpret=True)
    b = fused.fused_raw_device_onejit(jnp.asarray(q.price_ticks),
                                      jnp.asarray(q.amount_units),
                                      jnp.asarray(ci), jnp.asarray(side),
                                      interpret=True)
    for x, y in zip(jax.device_get(a), jax.device_get(b)):
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


class TestPackedVariant:
    """The packed 3-buffer readback path must be bit-identical to the
    per-array path (same device program, different output layout)."""

    def test_packed_matches_per_array(self):
        price, amount, side, q, ci = _mk(seed=11)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        kw = dict(tick_size=q.tick_size, amount_scale=q.amount_scale,
                  amounts_host=amount, ci_host=ci, interpret=True)
        o1, d1 = fused.bar_products_fused(*args, **kw)
        o2, d2 = fused.bar_products_fused(*args, packed=True, **kw)
        for k in o1:
            np.testing.assert_array_equal(
                np.asarray(o1[k]), np.asarray(o2[k]), err_msg=k)
        for k in d1:
            np.testing.assert_array_equal(
                np.asarray(d1[k]), np.asarray(d2[k]), err_msg=k)

    def test_packed_device_median_fallback(self):
        # without host amounts the packed path uses the device sort
        price, amount, side, q, ci = _mk(seed=12, n=3000, n_bars=30)
        o, d = fused.bar_products_fused(
            jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
            jnp.asarray(ci), jnp.asarray(side), tick_size=q.tick_size,
            amount_scale=q.amount_scale, packed=True, interpret=True,
            amounts_f32=jnp.asarray(amount))
        ref = aggregate.comp_bar_ohlcv(jnp.asarray(price),
                                       jnp.asarray(amount), jnp.asarray(ci))
        np.testing.assert_allclose(
            np.asarray(o["median_trade_size"]),
            np.asarray(ref["median_trade_size"]), rtol=1e-6, atol=1e-9)

    def test_packed_device_medians_match(self):
        # radix-select medians inside the packed program vs host medians
        price, amount, side, q, ci = _mk(seed=13)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        kw = dict(tick_size=q.tick_size, amount_scale=q.amount_scale,
                  interpret=True)
        o1, d1 = fused.bar_products_fused(
            *args, amounts_host=amount, ci_host=ci, packed=True, **kw)
        o2, d2 = fused.bar_products_fused(
            *args, packed=True, device_medians=True,
            amounts_f32=jnp.asarray(amount), ci_host=ci, **kw)
        np.testing.assert_array_equal(
            np.asarray(o1["median_trade_size"]),
            np.asarray(o2["median_trade_size"]))
        for k in o1:
            np.testing.assert_array_equal(np.asarray(o1[k]),
                                          np.asarray(o2[k]), err_msg=k)

    def test_median_engines_agree(self):
        # the three median engines (one-sort device / native host /
        # radix select) produce bit-identical brackets, incl. the empty
        # bar and duplicate amounts
        price, amount, side, q, ci = _mk(seed=21, n=5000, n_bars=60)
        amount[::7] = amount[3]  # force duplicate ties
        amt_j = jnp.asarray(amount)
        ci_j = jnp.asarray(ci)
        s_a, s_b = fused.median_sort_device(amt_j, ci_j, interpret=True)
        r_a, r_b = fused.median_select_device(amt_j, ci_j, interpret=True)
        # empty bars carry garbage in every engine (callers mask on the
        # trade count) — compare non-empty bars only
        ne = np.diff(ci) > 0
        np.testing.assert_array_equal(np.asarray(s_a)[ne], np.asarray(r_a)[ne])
        np.testing.assert_array_equal(np.asarray(s_b)[ne], np.asarray(r_b)[ne])
        from finmlkit_tpu import native
        host = native.seg_median_pair(amount, ci)
        if host is not None:
            np.testing.assert_array_equal(np.asarray(s_a)[ne], host[0][ne])
            np.testing.assert_array_equal(np.asarray(s_b)[ne], host[1][ne])
        # brackets average to np.median per bar
        med = (np.asarray(s_a, np.float64) + np.asarray(s_b, np.float64)) / 2
        for i in range(len(ci) - 1):
            lo_i, hi_i = ci[i] + 1, ci[i + 1] + 1
            if hi_i > lo_i and ne[i]:
                assert med[i] == np.median(amount[lo_i:hi_i].astype(np.float64))

    def test_medians_kwarg_dispatch(self):
        # medians="host" without host arrays falls back to the sort engine
        price, amount, side, q, ci = _mk(seed=22, n=2000, n_bars=25)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        kw = dict(tick_size=q.tick_size, amount_scale=q.amount_scale,
                  interpret=True)
        o_sort, _ = fused.bar_products_fused(*args, medians="sort", **kw)
        o_fall, _ = fused.bar_products_fused(*args, medians="host", **kw)
        np.testing.assert_array_equal(
            np.asarray(o_sort["median_trade_size"]),
            np.asarray(o_fall["median_trade_size"]))

    def test_rowtail_matches_planes_exactly(self):
        # boundary-output (v2) vs full-plane (v1) packed pipelines:
        # bit-identical packed buffers, incl. empty bars and zero sides
        price, amount, side, q, ci = _mk(seed=31, n=9000, n_bars=90)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        v1 = fused.fused_packed_device(*args, interpret=True)
        v2 = fused.fused_packed_v2_device(*args, interpret=True)
        for b1, b2, name in zip(v1, v2, ["i64", "i32", "f32"]):
            np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2),
                                          err_msg=name)

    def test_rowtail_unaligned_first_bar(self):
        # ci[0] >= 0 (open anchor inside the stream) exercises the
        # a0 start-position path of the v2 fixup
        price, amount, side, q, ci = _mk(seed=32, n=4000, n_bars=40)
        ci = ci.copy()
        ci[0] = 7  # anchor after trade 7
        ci = np.unique(ci)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        v1 = fused.fused_packed_device(*args, interpret=True)
        v2 = fused.fused_packed_v2_device(*args, interpret=True)
        for b1, b2, name in zip(v1, v2, ["i64", "i32", "f32"]):
            np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2),
                                          err_msg=name)

    def test_rowsort_median_engine(self):
        # batched row-sort engine vs one-sort engine: bit-identical,
        # including bars spanning row boundaries (small C) and the flat
        # fallback for bars longer than a row
        price, amount, side, q, ci = _mk(seed=41, n=5000, n_bars=55)
        amount[::5] = amount[2]  # ties
        amt_j, ci_j = jnp.asarray(amount), jnp.asarray(ci)
        ne = np.diff(ci) > 0
        s_a, s_b = fused.median_sort_device(amt_j, ci_j, interpret=True)
        for C in (512, 1024):
            r_a, r_b = fused.median_rowsort_device(amt_j, ci_j,
                                                   interpret=True, C=C)
            np.testing.assert_array_equal(np.asarray(r_a)[ne],
                                          np.asarray(s_a)[ne], err_msg=f"C={C}")
            np.testing.assert_array_equal(np.asarray(r_b)[ne],
                                          np.asarray(s_b)[ne], err_msg=f"C={C}")
        # giant bar -> flat-sort fallback path
        ci_big = np.array([-1, 2500, 4999], np.int64)
        f_a, f_b = fused.median_rowsort_device(amt_j, jnp.asarray(ci_big),
                                               interpret=True, C=512)
        g_a, g_b = fused.median_sort_device(amt_j, jnp.asarray(ci_big),
                                            interpret=True)
        np.testing.assert_array_equal(np.asarray(f_a), np.asarray(g_a))
        np.testing.assert_array_equal(np.asarray(f_b), np.asarray(g_b))

    def test_products_rowsort_medians(self):
        # the default medians="rowsort" through bar_products_fused
        price, amount, side, q, ci = _mk(seed=42, n=4000, n_bars=45)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        kw = dict(tick_size=q.tick_size, amount_scale=q.amount_scale,
                  interpret=True, amounts_f32=jnp.asarray(amount),
                  ci_host=ci, packed=True)
        o_row, _ = fused.bar_products_fused(*args, medians="rowsort", **kw)
        o_srt, _ = fused.bar_products_fused(*args, medians="sort", **kw)
        np.testing.assert_array_equal(
            np.asarray(o_row["median_trade_size"]),
            np.asarray(o_srt["median_trade_size"]))

    def test_rowsort_anchored_spanning_edges(self):
        # anchored stream whose FIRST bar spans a row boundary, plus
        # boundary-adjacent one-trade bars and empty bars, heavy ties
        r = np.random.default_rng(7)
        n = 3000
        amount = np.maximum(np.round(r.lognormal(-2.5, 1.2, n), 5),
                            1e-5).astype(np.float32)
        amount[::3] = amount[10]
        ci = np.array([500, 600, 601, 700, 1023, 1024, 1025, 2047, 2999],
                      np.int64)
        ma, mb = fused.median_rowsort_device(
            jnp.asarray(amount), jnp.asarray(ci), interpret=True, C=512)
        ma = np.asarray(ma, np.float64)
        mb = np.asarray(mb, np.float64)
        for i in range(len(ci) - 1):
            s, e = ci[i] + 1, ci[i + 1] + 1
            if e > s:
                assert (ma[i] + mb[i]) / 2 == \
                    np.median(amount[s:e].astype(np.float64)), i

    def test_fused_medians_one_program(self):
        # medians="rowsort+fused" (one compiled program) must equal the
        # two-program rowsort arrangement on every output
        price, amount, side, q, ci = _mk(seed=43, n=4000, n_bars=45)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        kw = dict(tick_size=q.tick_size, amount_scale=q.amount_scale,
                  interpret=True, amounts_f32=jnp.asarray(amount),
                  ci_host=ci, packed=True)
        o1, d1 = fused.bar_products_fused(*args, medians="rowsort", **kw)
        o2, d2 = fused.bar_products_fused(*args, medians="rowsort+fused",
                                          **kw)
        for k in o1:
            np.testing.assert_array_equal(np.asarray(o1[k]),
                                          np.asarray(o2[k]), err_msg=k)
        for k in d1:
            np.testing.assert_array_equal(np.asarray(d1[k]),
                                          np.asarray(d2[k]), err_msg=k)

    def test_rowtail_v4_matches_v2_plane(self):
        # the MXU-offloaded reduce kernel (round-5 default on TPU) must
        # be bit-identical to the per-quantity v2 kernel — exact 16-bit
        # component arithmetic, same single pair->f32 rounding
        from finmlkit_tpu.ops import fused_scan as FS
        price, amount, side, q, ci = _mk(seed=52, n=70000, n_bars=80)
        planes_in, _ = fused.prep_planes(
            jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
            jnp.asarray(side), jnp.asarray(ci))
        v2 = np.asarray(FS.bar_scan_rowtails(*planes_in, interpret=True))
        v4 = np.asarray(FS.bar_scan_rowtails_v4(*planes_in, interpret=True))
        np.testing.assert_array_equal(v2, v4)

    def test_rowtail_v4_products_pipeline(self):
        # scan="rowtail4" through bar_products_fused: identical outputs
        price, amount, side, q, ci = _mk(seed=53, n=9000, n_bars=90)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        kw = dict(tick_size=q.tick_size, amount_scale=q.amount_scale,
                  interpret=True, amounts_f32=jnp.asarray(amount),
                  ci_host=ci, packed=True)
        o2, d2 = fused.bar_products_fused(*args, scan="rowtail", **kw)
        o4, d4 = fused.bar_products_fused(*args, scan="rowtail4", **kw)
        for k in o2:
            np.testing.assert_array_equal(np.asarray(o2[k]),
                                          np.asarray(o4[k]), err_msg=k)
        for k in d2:
            np.testing.assert_array_equal(np.asarray(d2[k]),
                                          np.asarray(d4[k]), err_msg=k)

    def test_one_buffer_readback_matches(self):
        # the single-buffer packed readback (i64 split + f32 bitcast)
        # must reproduce the 3-buffer path bit-for-bit
        price, amount, side, q, ci = _mk(seed=54, n=5000, n_bars=50)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        kw = dict(tick_size=q.tick_size, amount_scale=q.amount_scale,
                  interpret=True, amounts_f32=jnp.asarray(amount),
                  ci_host=ci, packed=True)
        o3, d3 = fused.bar_products_fused(*args, **kw)
        o1, d1 = fused.bar_products_fused(*args, one_buffer=True, **kw)
        for k in o3:
            np.testing.assert_array_equal(np.asarray(o3[k]),
                                          np.asarray(o1[k]), err_msg=k)
        for k in d3:
            np.testing.assert_array_equal(np.asarray(d3[k]),
                                          np.asarray(d1[k]), err_msg=k)

    def test_adaptive_C_picker(self):
        # _rowsort_pick_C: smallest power-of-two >= max bar (floor 8192
        # by default; env floor respected), dividing n_pad
        import os
        old = os.environ.pop("FMKT_ROWSORT_CMIN", None)
        try:
            assert fused._rowsort_pick_C(985, 32768 * 4) == 8192
            assert fused._rowsort_pick_C(9000, 32768 * 4) == 16384
            assert fused._rowsort_pick_C(32768, 32768 * 4) == 32768
            # beyond the cap -> signals flat fallback
            assert fused._rowsort_pick_C(40000, 32768 * 4) > 32768
            os.environ["FMKT_ROWSORT_CMIN"] = "512"
            assert fused._rowsort_pick_C(100, 32768 * 4) == 512
        finally:
            os.environ.pop("FMKT_ROWSORT_CMIN", None)
            if old is not None:
                os.environ["FMKT_ROWSORT_CMIN"] = old

    def test_rowsort_adversarial_medians(self):
        # VERDICT r4 #10: random ties, empty bars, single-trade bars,
        # bars exactly == C, huge (>2^31-unit) amounts, across C widths
        r = np.random.default_rng(77)
        n = 4096
        amount = np.maximum(np.round(r.lognormal(-2.5, 1.2, n), 5),
                            1e-5).astype(np.float32)
        amount[::4] = amount[1]              # heavy ties
        amount[100:200] = 3.0e9              # > 2^31 units at 1e-8 scale
        amount[200:300] = np.float32(5e9)
        ci = np.unique(np.array(
            [-1, 0, 1, 2, 511, 512, 513, 514, 1023, 1535,
             1536, 2047, 2048, 3000, 3001, 3001, 4095], np.int64))
        ci = np.sort(np.concatenate([ci, [ci[4]]]))  # duplicate => empty
        ne = np.diff(ci) > 0
        amt_j, ci_j = jnp.asarray(amount), jnp.asarray(ci)
        for C in (512, 1024, 2048):
            ma, mb = fused.median_rowsort_device(amt_j, ci_j,
                                                 interpret=True, C=C)
            ma = np.asarray(ma, np.float64)
            mb = np.asarray(mb, np.float64)
            for i in range(len(ci) - 1):
                s, e = ci[i] + 1, ci[i + 1] + 1
                if e > s and ne[i]:
                    want = np.median(amount[s:e].astype(np.float64))
                    assert (ma[i] + mb[i]) / 2 == want, (C, i)

    def test_final_readback_matches(self):
        # device-side f64 conversion + single final-dtype buffer must be
        # bit-identical to the host-convert path (same IEEE op order)
        price, amount, side, q, ci = _mk(seed=66, n=6000, n_bars=60)
        args = (jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
                jnp.asarray(ci), jnp.asarray(side))
        o3, d3 = fused.bar_products_fused(
            *args, tick_size=q.tick_size, amount_scale=q.amount_scale,
            amounts_f32=jnp.asarray(amount), ci_host=ci, packed=True,
            interpret=True)
        of, df = fused.bar_products_final_device(
            *args, tick_size=q.tick_size, amount_scale=q.amount_scale,
            amounts_f32=jnp.asarray(amount), ci_host=ci, interpret=True,
            kernel="v2")
        for k in o3:
            np.testing.assert_array_equal(np.asarray(o3[k]),
                                          np.asarray(of[k]), err_msg=k)
        for k in d3:
            np.testing.assert_array_equal(np.asarray(d3[k]),
                                          np.asarray(df[k]), err_msg=k)

    def test_rowtail_v3_matches_v2_plane(self):
        # the batched-row-phase kernel variant must be bit-identical to
        # the per-quantity v2 kernel (it is kept as a tested negative
        # perf result; see BENCH_NOTES.md)
        from finmlkit_tpu.ops import fused_scan as FS
        price, amount, side, q, ci = _mk(seed=51, n=70000, n_bars=80)
        planes_in, _ = fused.prep_planes(
            jnp.asarray(q.price_ticks), jnp.asarray(q.amount_units),
            jnp.asarray(side), jnp.asarray(ci))
        v2 = np.asarray(FS.bar_scan_rowtails(*planes_in, interpret=True))
        v3 = np.asarray(FS.bar_scan_rowtails_v3(*planes_in, interpret=True))
        np.testing.assert_array_equal(v2, v3)

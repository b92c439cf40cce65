"""Whole-graph FeatureKit compilation: ONE jit program per build.

The per-feature execution path dispatches every transform as its own
device program — each dispatch costs tens of ms over a remote transport
(round-3 driver: 1,640 ms for 6 features over 45k bars). This module
compiles the topo-ordered feature DAG into ONE jitted function instead
(SURVEY §7 "jit-compiled DAG"): XLA fuses/CSEs the shared subexpressions
(the cache-column reuse falls out of common-subexpression elimination),
and the host pays a single dispatch plus one packed readback per dtype.

Mechanism: transforms' existing ``_jax`` tiers are traced directly by
feeding them a :class:`_TraceFrame` — a DataFrame stand-in whose columns
yield jnp tracers — with ``_raw_out`` set so ``_prepare_output`` returns
raw arrays instead of pandas Series. Nodes whose ``_jax`` tier is not
trace-safe (calendar transforms that fall back to pandas, host-side
post-processing like CUSUMTest's groupby ages) are detected with a
``jax.eval_shape`` probe and executed on the host AFTER the jit, reading
compiled outputs from the column cache. A graph node is only eligible
when every required column is an original input or another graph node's
output, so dataflow is always jit -> host, never interleaved.

Reference behavior being accelerated: FeatureKit.build
(/root/reference/finmlkit/feature/kit.py) with the same column-cache and
output-ordering semantics.
"""
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..utils.log import get_logger
from .base import CoreTransform

logger = get_logger(__name__)


class _TraceCol:
    """Column stand-in: exposes ``.values`` like a pandas Series."""

    __slots__ = ("values",)

    def __init__(self, arr):
        self.values = arr


class _TraceFrame:
    """DataFrame stand-in that flows jnp tracers through ``_jax`` tiers.

    Provides exactly the surface the array-level tiers touch:
    ``x[col].values``, ``x.columns``, ``x.index`` (dummy; unused in raw
    mode) and the timestamp hook consumed by
    ``CoreTransform._get_timestamps``.
    """

    def __init__(self, env: Dict[str, object], ts=None):
        self._env = env
        self.trace_ts = ts  # int64 ns epoch array (tracer) or None

    def __getitem__(self, c):
        return _TraceCol(self._env[c])

    def __contains__(self, c):
        return c in self._env

    @property
    def columns(self):
        return list(self._env.keys())

    @property
    def index(self):
        return None  # only ever passed to _prepare_output (raw mode)


def _call_raw(t: CoreTransform, frame: _TraceFrame):
    """Run a transform's _jax tier with raw (array) outputs."""
    t._raw_out = True
    try:
        return t._jax(frame)
    finally:
        t._raw_out = False


def _out_cols(t) -> List[str]:
    n = t.output_name
    return [n] if isinstance(n, str) else list(n)


def _as_tuple(y):
    return y if isinstance(y, tuple) else (y,)


def plan(features, col_specs: Dict[str, jax.ShapeDtypeStruct], ts_spec):
    """Partition features into (graph_nodes, host_nodes).

    A feature joins the graph when its transform is a CoreTransform, all
    required columns are graph-available, and a ``jax.eval_shape`` probe
    of its ``_jax`` tier succeeds (host-side tiers raise on tracers).
    Probing is chained: each graph node's output specs become available
    to later nodes.
    """
    env_specs = dict(col_specs)
    graph, host = [], []
    produced: set = set()
    for feat in features:
        t = feat.transform
        ok = isinstance(t, CoreTransform) and \
            all(r in env_specs for r in t.requires)
        # two graph features writing the same output column would
        # collapse to one entry in the graph's output dict (each feature
        # must keep its own result, as on the per-feature path) — demote
        # the later one to a host node
        if ok and produced.intersection(_out_cols(t)):
            logger.debug(f"feature {feat.name}: host node "
                         "(duplicate output column)")
            ok = False
        out_spec = None
        if ok:
            try:
                out_spec = jax.eval_shape(
                    lambda arrs, ts, _t=t: _as_tuple(
                        _call_raw(_t, _TraceFrame(arrs, ts))),
                    {r: env_specs[r] for r in t.requires}, ts_spec)
            except Exception as e:  # noqa: BLE001 — any failure = host node
                logger.debug(f"feature {feat.name}: host node ({e!r})")
                ok = False
        if ok:
            for name, spec in zip(_out_cols(t), out_spec):
                env_specs[name] = spec
            produced.update(_out_cols(t))
            graph.append(feat)
        else:
            host.append(feat)
    return graph, host


def make_graph_fn(graph_feats, f64_cols, other_cols):
    """Build the single traced function over the topo-ordered graph.

    Inputs arrive as ONE stacked float64 matrix (one transfer through
    the transport instead of one per column, sliced inside the program)
    plus a dict of non-f64 leftovers. Returns ``{dtype_name: stacked}``
    packing all outputs of one dtype into one buffer (one readback per
    dtype) plus the static unpack layout.
    """
    layout: List[Tuple[str, str]] = []  # (dtype_name, col) in pack order

    def fn(mat, arrs, ts):
        env = dict(arrs)
        for i, c in enumerate(f64_cols):
            env[c] = mat[i]
        outs = {}
        for feat in graph_feats:
            t = feat.transform
            ys = _as_tuple(_call_raw(t, _TraceFrame(env, ts)))
            for c, y in zip(_out_cols(t), ys):
                env[c] = y
                outs[c] = y
        by_dtype: Dict[str, list] = {}
        layout.clear()
        for c, y in outs.items():
            key = str(y.dtype)
            by_dtype.setdefault(key, []).append(y)
            layout.append((key, c))
        return {k: jnp.stack(v) for k, v in by_dtype.items()}

    return fn, layout


class FusedGraph:
    """A compiled feature DAG bound to one FeatureKit feature sequence."""

    def __init__(self, graph_feats, host_feats, col_dtypes=None):
        self.graph_feats = graph_feats
        self.host_feats = host_feats
        self._in_cols = self._input_columns()
        # input packing split is fixed at compile time; only columns that
        # are ALREADY float64 join the packed matrix (packing must not
        # change the dtype a transform's tier sees) — the rest travel
        # individually
        col_dtypes = col_dtypes or {}
        self._f64_cols = [c for c in self._in_cols
                          if col_dtypes.get(c) == np.dtype(np.float64)]
        self._other_cols = [c for c in self._in_cols
                            if c not in self._f64_cols]
        fn, self._layout = make_graph_fn(graph_feats, self._f64_cols,
                                         self._other_cols)
        self._jitted = jax.jit(fn)

    def _input_columns(self):
        produced = set()
        needed = set()
        for feat in self.graph_feats:
            t = feat.transform
            needed.update(r for r in t.requires if r not in produced)
            produced.update(_out_cols(t))
        return sorted(needed)

    def run(self, df: pd.DataFrame, ts_np) -> Dict[str, np.ndarray]:
        """One dispatch; returns host numpy arrays keyed by column."""
        mat = jnp.asarray(np.stack(
            [df[c].to_numpy() for c in self._f64_cols])
            if self._f64_cols else np.zeros((0, len(df))))
        arrs = {c: jnp.asarray(df[c].to_numpy())
                for c in self._other_cols}
        ts = None if ts_np is None else jnp.asarray(ts_np)
        packed = self._jitted(mat, arrs, ts)
        for b in packed.values():  # overlap readback DMA across buffers
            try:
                b.copy_to_host_async()
            except AttributeError:
                break
        packed_np = jax.device_get(packed)
        counters: Dict[str, int] = {}
        out = {}
        for key, col in self._layout:
            i = counters.get(key, 0)
            counters[key] = i + 1
            out[col] = packed_np[key][i]
        return out


    def run_device(self, cols: Dict[str, "jnp.ndarray"], ts=None,
                   as_numpy: bool = True):
        """One dispatch from DEVICE-RESIDENT inputs (no host re-upload).

        ``cols`` maps column name -> device array (any dtype castable to
        the planned spec). The device-resident combined pipeline feeds
        bar products straight from the bar programs' output buffers —
        the reference chains stages in-memory for free
        (feature/kit.py:1014-1085); through a remote transport the
        re-upload costs more than the compute (BENCH_NOTES.md r4).
        With ``as_numpy=False`` returns the packed device buffers +
        layout for the caller to overlap readbacks.
        """
        mat = (jnp.stack([cols[c].astype(jnp.float64)
                          for c in self._f64_cols])
               if self._f64_cols else jnp.zeros((0, 1)))
        arrs = {c: cols[c] for c in self._other_cols}
        packed = self._jitted(mat, arrs, ts)
        if not as_numpy:
            return packed, list(self._layout)
        for b in packed.values():
            try:
                b.copy_to_host_async()
            except AttributeError:
                break
        packed_np = jax.device_get(packed)
        counters: Dict[str, int] = {}
        out = {}
        for key, col in self._layout:
            i = counters.get(key, 0)
            counters[key] = i + 1
            out[col] = packed_np[key][i]
        return out


def build_fused_from_specs(features, col_specs, ts_spec=None):
    """Plan + compile a FusedGraph from explicit column specs (device-
    resident pipelines have no DataFrame). All features must plan onto
    the graph; host-tier features raise (the caller owns the columns)."""
    graph, host = plan(features, dict(col_specs), ts_spec)
    if host:
        raise ValueError(
            f"features {[f.name for f in host]} need host tiers; the "
            "device-resident pipeline supports graph features only")
    col_dtypes = {c: s.dtype for c, s in col_specs.items()}
    return FusedGraph(graph, [], col_dtypes)


def build_fused(features, df: pd.DataFrame):
    """Plan + compile a FusedGraph for ``features`` over ``df``'s columns.

    Returns (FusedGraph, ts_np). Numeric/bool columns become jit inputs;
    anything else forces consumers to the host path.
    """
    col_specs = {}
    for c in df.columns:
        dt = df[c].to_numpy().dtype
        if np.issubdtype(dt, np.number) or np.issubdtype(dt, np.bool_):
            col_specs[c] = jax.ShapeDtypeStruct((len(df),), dt)
    ts_np = None
    ts_spec = None
    if isinstance(df.index, pd.DatetimeIndex):
        ts_np = df.index.values.astype("datetime64[ns]").astype(np.int64)
        ts_spec = jax.ShapeDtypeStruct((len(df),), np.int64)
    graph, host = plan(features, col_specs, ts_spec)
    col_dtypes = {c: s.dtype for c, s in col_specs.items()}
    return FusedGraph(graph, host, col_dtypes), ts_np

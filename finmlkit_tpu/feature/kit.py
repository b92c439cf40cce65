"""Feature / Compose / FeatureKit — the fluent pipeline API.

Parity: /root/reference/finmlkit/feature/kit.py — operator-overloaded
Feature wrapper with cache short-circuiting, sequential Compose chains
with per-step cache reuse, and the FeatureKit batch executor with
incremental DataFrame caching, topo ordering and an ASCII timing chart.
Default backend is ``"jax"`` (the TPU tier); ``"nb"`` is accepted as an
alias, ``"pd"`` is the pandas reference path.
"""
import json
import time

import numpy as np
import pandas as pd

from ..utils.log import get_logger
from .base import (
    BaseTransform,
    BinaryOpTransform,
    ConstantOpTransform,
    MinMaxOpTransform,
    MISOTransform,
    SISOTransform,
    UnaryOpTransform,
)
from .utils import (
    ComputationGraph,
    build_feature_graph,
    transform_from_config,
    transform_to_config,
)

logger = get_logger(__name__)


class Feature:
    """Fluent wrapper around a transform with math operators and caching."""

    def __init__(self, transform: BaseTransform):
        self.transform = transform
        self._name = transform.output_name

    def __call__(self, x: pd.DataFrame, *, cache: pd.DataFrame = None, backend="jax"):
        if cache is not None and isinstance(self.transform.output_name, str) \
                and self.transform.output_name in cache.columns:
            logger.info(f"Using cached output for {self.transform.output_name}")
            return cache[self.transform.output_name]
        return self.transform(x, backend=backend)

    @property
    def name(self):
        return self._name

    @name.setter
    def name(self, output_name):
        assert type(output_name) == type(self._name), "Same type"
        if isinstance(output_name, (tuple, list)):
            assert len(output_name) == len(self._name), "same length"
        self._name = output_name

    # --- serialization ------------------------------------------------
    def to_config(self) -> dict:
        return {
            "name": self._name if isinstance(self._name, str) else list(self._name),
            "transform": transform_to_config(self.transform),
        }

    @staticmethod
    def from_config(cfg: dict) -> "Feature":
        f = Feature(transform_from_config(cfg["transform"]))
        name = cfg.get("name")
        if name is not None:
            f.name = name if isinstance(f._name, str) or not isinstance(name, list) else list(name)
        return f

    # --- functional composition ---------------------------------------
    def apply(self, func, *args, suffix=None, **kwargs):
        """Apply an arbitrary callable to this feature's output."""
        func_name = suffix if suffix is not None else func.__name__
        new_name = f"{self.name}_{func_name}"
        transform = UnaryOpTransform(self.transform, func_name,
                                     lambda x: func(x, *args, **kwargs))
        transform.produces = [new_name]
        feature = Feature(transform)
        feature.name = new_name
        return feature

    # --- arithmetic operators ------------------------------------------
    def _binary(self, other, op_name, op):
        if isinstance(other, Feature):
            return Feature(BinaryOpTransform(self.transform, other.transform, op_name, op))
        if isinstance(other, (int, float)):
            return Feature(ConstantOpTransform(self.transform, other, op_name, op))
        return NotImplemented

    def __add__(self, other):
        return self._binary(other, "add", lambda x, y: x + y)

    def __sub__(self, other):
        return self._binary(other, "sub", lambda x, y: x - y)

    def __mul__(self, other):
        return self._binary(other, "mul", lambda x, y: x * y)

    def __truediv__(self, other):
        return self._binary(other, "div", lambda x, y: x / y)

    def __radd__(self, other):
        if isinstance(other, (int, float)):
            return Feature(ConstantOpTransform(self.transform, other, "add", lambda x, c: x + c))
        return NotImplemented

    def __rmul__(self, other):
        if isinstance(other, (int, float)):
            return Feature(ConstantOpTransform(self.transform, other, "mul", lambda x, c: x * c))
        return NotImplemented

    def __rsub__(self, other):
        if isinstance(other, (int, float)):
            return Feature(ConstantOpTransform(self.transform, other, "rsub", lambda x, c: c - x))
        return NotImplemented

    def __rtruediv__(self, other):
        if isinstance(other, (int, float)):
            return Feature(ConstantOpTransform(self.transform, other, "rdiv", lambda x, c: c / x))
        return NotImplemented

    def __abs__(self):
        return Feature(UnaryOpTransform(self.transform, "abs", lambda x: x.abs()))

    # --- convenience ops -----------------------------------------------
    def abs(self):
        return self.__abs__()

    def clip(self, lower=None, upper=None):
        suffix = f"clip_{lower}_{upper}".replace("None", "")
        return self.apply(lambda x: x.clip(lower=lower, upper=upper), suffix=suffix)

    def log(self):
        return self.apply(lambda x: x.apply(lambda v: np.log(v) if v > 0 else np.nan), suffix="log")

    def log1p(self):
        return self.apply(lambda x: x.apply(lambda v: np.log1p(v) if v >= 0 else np.nan), suffix="log1p")

    def exp(self):
        return self.apply(lambda x: x.apply(np.exp), suffix="exp")

    def square(self):
        return self.apply(lambda x: x ** 2, suffix="square")

    def sqrt(self):
        return self.apply(lambda x: x.apply(lambda v: np.sqrt(v) if v >= 0 else np.nan), suffix="sqrt")

    def rolling_mean(self, window):
        return self.apply(lambda x: x.rolling(window=window).mean(), suffix=f"rmean{window}")

    def ema(self, span, adjust=True):
        return self.apply(lambda x: x.ewm(span=span, adjust=adjust).mean(), suffix=f"ema{span}")

    def rolling_sum(self, window):
        return self.apply(lambda x: x.rolling(window=window).sum(), suffix=f"rsum{window}")

    def rolling_std(self, window):
        return self.apply(lambda x: x.rolling(window=window).std(), suffix=f"rstd{window}")

    def lag(self, period):
        return self.apply(lambda x: x.shift(period), suffix=f"lag{period}")

    @staticmethod
    def min(a, b):
        return Feature._minmax(a, b, "min", np.minimum)

    @staticmethod
    def max(a, b):
        return Feature._minmax(a, b, "max", np.maximum)

    @staticmethod
    def _minmax(a, b, op_name, op):
        if isinstance(a, Feature) and isinstance(b, Feature):
            return Feature(MinMaxOpTransform(a.transform, b.transform, op_name,
                                             lambda x, y: op(x, y)))
        if isinstance(a, Feature) and isinstance(b, (int, float)):
            return Feature(ConstantOpTransform(a.transform, b, op_name,
                                               lambda x, c: op(x, c)))
        if isinstance(b, Feature) and isinstance(a, (int, float)):
            return Feature(ConstantOpTransform(b.transform, a, op_name,
                                               lambda x, c: op(x, c)))
        return NotImplemented


class Compose(BaseTransform):
    """Sequential chain of single-output transforms with cache reuse.

    Composed name = ``first_output + "_" + produces...`` (kit.py:637-641);
    per-step and final-output cache short-circuits (kit.py:665-710).
    """

    def __init__(self, *transforms):
        requires = transforms[0].requires[0]
        first_output = transforms[0].output_name
        produces = "_".join([first_output] + [t.produces[0] for t in transforms[1:]])
        super().__init__(requires, produces)
        self.transforms = transforms

    def _validate_input(self, x: pd.DataFrame) -> bool:
        if not isinstance(x, pd.DataFrame):
            raise TypeError("Input must be a pandas DataFrame")
        if self.requires[0] not in x.columns:
            raise ValueError(f"Input column {self.requires} not found in DataFrame")
        return True

    @property
    def output_name(self) -> str:
        return self.produces[0]

    def __call__(self, x: pd.DataFrame, *, backend="jax") -> pd.Series:
        assert backend in ("pd", "nb", "jax"), "Backend must be 'pd', 'nb' or 'jax'."
        self._validate_input(x)
        final_name = self.output_name
        if final_name in x.columns:
            return x[final_name]

        current = None
        for i, tfs in enumerate(self.transforms):
            step_out = tfs.produces[0]
            if step_out in x.columns:
                current = x[step_out]
                continue
            if i == 0:
                current = tfs(x, backend=backend)
            else:
                req = tfs.requires[0]
                if req in x.columns:
                    df_in = x[[req]]
                else:
                    df_in = pd.DataFrame(current.values, index=current.index,
                                         columns=[req])
                current = tfs(df_in, backend=backend)
        current.name = final_name
        return current


class FeatureKit:
    """Batch executor over a list of Features with incremental caching."""

    def __init__(self, features, retain=None):
        self.features = features
        self.retain = retain or []

    # --- serialization ------------------------------------------------
    def to_config(self) -> dict:
        return {
            "retain": list(self.retain),
            "features": [f.to_config() for f in self.features],
        }

    def save_config(self, path: str):
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.to_config(), f, ensure_ascii=False, indent=2)

    @staticmethod
    def from_dict(cfg: dict) -> "FeatureKit":
        feats = [Feature.from_config(fc) for fc in cfg.get("features", [])]
        return FeatureKit(feats, retain=cfg.get("retain", []))

    @classmethod
    def from_config(cls, path: str) -> "FeatureKit":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    # --- graph --------------------------------------------------------
    def build_graph(self) -> ComputationGraph:
        return build_feature_graph(self.features)

    def topological_order(self):
        g = self.build_graph()
        names = [str(f.name) for f in self.features]
        name_set = set(names)
        edges = {n: set() for n in name_set}
        indeg = {n: 0 for n in name_set}
        for src, dests in g.edges.items():
            if src not in name_set:
                continue
            for d in dests:
                if d in name_set:
                    if d not in edges[src]:
                        edges[src].add(d)
                        indeg[d] += 1
        ready = [n for n in names if indeg[n] == 0]
        order = []
        while ready:
            n = ready.pop(0)
            order.append(n)
            for d in sorted(edges[n]):
                indeg[d] -= 1
                if indeg[d] == 0:
                    ready.append(d)
        missing = [n for n in names if n not in order]
        return order + missing

    # --- execution ----------------------------------------------------
    def build(self, df, *, backend="jax", timeit=False, order: str = "defined",
              profile_dir: str = None, fuse: bool = None):
        """Run all features; returns retained + computed columns.

        ``order="topo"`` executes in dependency order so features that
        consume other features' outputs hit the column cache.

        ``fuse`` (default: on for the jax backend) compiles the whole
        topo-ordered DAG into ONE jit program (feature/fuse.py) — one
        device dispatch per build instead of one per transform, with XLA
        CSE playing the role of the column cache. Host-only transforms
        (calendar logic, pandas post-processing) run after the compiled
        graph, reading its outputs from the cache. ``timeit=True`` and
        ``profile_dir`` keep the per-feature path so the timing chart /
        per-feature trace annotations stay meaningful; ``FMKT_FUSE=0``
        disables fusion globally.

        ``profile_dir`` (or the ``FMKT_PROFILE_DIR`` env var) captures a
        ``jax.profiler`` device trace of the whole build, with one named
        TraceAnnotation per feature — the TPU-native analog of the
        reference's wall-clock timeit chart (SURVEY §5); view with
        TensorBoard or Perfetto.
        """
        import contextlib
        import os as _os

        profile_dir = profile_dir or _os.environ.get("FMKT_PROFILE_DIR")

        out = df[self.retain].copy()
        df = df.copy()

        features_seq = self.features
        if order == "topo":
            name2feat = {str(f.name): f for f in self.features}
            topo = self.topological_order()
            features_seq = [name2feat[n] for n in topo if n in name2feat]
            features_seq += [f for f in self.features if str(f.name) not in set(topo)]

        if fuse is None:
            fuse = (backend in ("jax", "nb") and not timeit
                    and not profile_dir
                    and _os.environ.get("FMKT_FUSE", "1") != "0")
        if fuse:
            try:
                return self._build_fused(df, out, features_seq, backend)
            except Exception as e:  # noqa: BLE001 — correctness first
                logger.warning(f"fused graph build failed ({e!r}); "
                               f"falling back to per-feature execution")

        if profile_dir:
            import jax
            trace_ctx = jax.profiler.trace(profile_dir)

            def annot(name):
                return jax.profiler.TraceAnnotation(f"feature:{name}")
        else:
            trace_ctx = contextlib.nullcontext()

            def annot(name):
                return contextlib.nullcontext()

        timing = {}
        with trace_ctx:
            for feat in features_seq:
                t0 = time.time() if timeit else None
                with annot(str(feat.name)):
                    res = feat(df, cache=df, backend=backend)
                if timeit:
                    timing[str(feat.name)] = time.time() - t0
                self._store_result(out, df, feat, res)

        if timeit:
            print("\nFeature Timing Analysis:")
            print("=======================")
            ordered = sorted(timing.items(), key=lambda kv: kv[1], reverse=True)
            max_t = max((t for _, t in ordered), default=0.0)
            for name, t in ordered:
                bar = "█" * (int(t / max_t * 50) if max_t > 0 else 0)
                print(f"{name:<30} | {bar} {t:.4f}s")
        return out

    def _build_fused(self, df, out, features_seq, backend):
        """One-dispatch whole-graph execution (see feature/fuse.py)."""
        from .fuse import build_fused

        def _names(t):
            n = t.output_name
            return [n] if isinstance(n, str) else list(n)

        # columns already present in the input frame short-circuit the
        # cache exactly like the per-feature path — keep them host-side
        fuse_feats = [f for f in features_seq
                      if not all(c in df.columns
                                 for c in _names(f.transform))]
        key = (tuple(id(f) for f in fuse_feats),
               tuple(sorted((c, str(df[c].to_numpy().dtype))
                            for c in df.columns)),
               isinstance(df.index, pd.DatetimeIndex))
        cached = getattr(self, "_fused_cache", None)
        if cached is not None and cached[0] == key:
            graph = cached[1]
        else:
            graph, _ = build_fused(fuse_feats, df)
            self._fused_cache = (key, graph)
            logger.info(f"fused feature graph: {len(graph.graph_feats)} "
                        f"compiled + {len(graph.host_feats)} host of "
                        f"{len(features_seq)} features")
        ts_np = (df.index.values.astype("datetime64[ns]").astype(np.int64)
                 if isinstance(df.index, pd.DatetimeIndex) else None)
        results = graph.run(df, ts_np) if graph.graph_feats else {}
        graph_ids = {id(f) for f in graph.graph_feats}
        for feat in features_seq:
            t = feat.transform
            if id(feat) in graph_ids:
                names = t.output_name
                if isinstance(names, str):
                    res = pd.Series(results[names], index=df.index,
                                    name=names)
                else:
                    res = tuple(pd.Series(results[nm], index=df.index,
                                          name=nm) for nm in names)
            else:
                res = feat(df, cache=df, backend=backend)
            self._store_result(out, df, feat, res)
        return out

    @staticmethod
    def _store_result(out, df, feat, res):
        if isinstance(res, pd.Series):
            out[feat.name] = res
            df[feat.transform.output_name] = res
        elif isinstance(res, tuple):
            for item in res:
                out[item.name] = item
                df[item.name] = item
        else:
            raise TypeError(f"Transform {feat} returned unexpected type: {type(res)}")

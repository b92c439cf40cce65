"""Feature serialization (JSON configs) and the computation graph.

Parity: /root/reference/finmlkit/feature/utils.py — recursive configs by
kind (binary / minmax / const / unary / compose / external / generic via
constructor signature), dynamic unary-name parsing (clip_* / rmean / rstd
/ rsum / ema / lag), Timedelta encoding, and a Kahn-toposort DAG of
feature dependencies.
"""
from __future__ import annotations

import importlib
import inspect
from typing import Any, Dict, List, Set

import numpy as np
import pandas as pd

from ..utils.log import get_logger
from .base import (
    BaseTransform,
    BinaryOpTransform,
    ConstantOpTransform,
    MinMaxOpTransform,
    UnaryOpTransform,
)

logger = get_logger(__name__)


# --- value (de)serialization -------------------------------------------------

def _serialize_value(val: Any) -> Any:
    if isinstance(val, pd.Timedelta):
        return {"__timedelta__": True, "seconds": val.total_seconds()}
    if isinstance(val, (str, int, float, bool)) or val is None:
        return val
    if isinstance(val, (list, tuple)):
        return [_serialize_value(v) for v in val]
    if isinstance(val, dict):
        return {k: _serialize_value(v) for k, v in val.items()}
    if isinstance(val, np.generic):
        return val.item()
    return str(val)


def _deserialize_value(val: Any) -> Any:
    if isinstance(val, dict) and val.get("__timedelta__"):
        return pd.Timedelta(seconds=val["seconds"])
    if isinstance(val, list):
        return [_deserialize_value(v) for v in val]
    if isinstance(val, dict):
        return {k: _deserialize_value(v) for k, v in val.items()}
    return val


def _class_path(obj: Any) -> str:
    cls = obj if isinstance(obj, type) else obj.__class__
    return f"{cls.__module__}.{cls.__name__}"


def _import_class(path: str):
    module_name, cls_name = path.rsplit(".", 1)
    return getattr(importlib.import_module(module_name), cls_name)


# --- op registries -----------------------------------------------------------

OP_BINARY = {
    "add": lambda x, y: x + y,
    "sub": lambda x, y: x - y,
    "mul": lambda x, y: x * y,
    "div": lambda x, y: x / y,
    "rsub": lambda x, y: y - x,
    "rdiv": lambda x, y: y / x,
}

OP_MINMAX = {
    "min": lambda x, y: np.minimum(x, y),
    "max": lambda x, y: np.maximum(x, y),
}

OP_UNARY = {
    "abs": lambda x: x.abs(),
    "log": lambda x: x.apply(lambda v: np.log(v) if v > 0 else np.nan),
    "log1p": lambda x: x.apply(lambda v: np.log1p(v) if v >= 0 else np.nan),
    "exp": lambda x: x.apply(np.exp),
    "square": lambda x: x ** 2,
    "sqrt": lambda x: x.apply(lambda v: np.sqrt(v) if v >= 0 else np.nan),
}


def resolve_unary_op(name: str):
    """Resolve a unary op callable from its recorded name, including the
    parameterized families clip_<lo>_<hi>, rmean/rstd/rsum/ema/lag<N>."""
    if name.startswith("clip_"):
        parts = name.split("_")

        def _bound(i):
            try:
                return float(parts[i]) if len(parts) > i and parts[i] != "" else None
            except (ValueError, IndexError):
                return None
        lo, hi = _bound(1), _bound(2)
        return lambda x: x.clip(lower=lo, upper=hi)

    for prefix, maker in (
        ("rmean", lambda n: (lambda x: x.rolling(window=n).mean())),
        ("rstd", lambda n: (lambda x: x.rolling(window=n).std())),
        ("rsum", lambda n: (lambda x: x.rolling(window=n).sum())),
        ("tsum", lambda n: (lambda x: x.rolling(window=n).sum())),
        ("ema", lambda n: (lambda x: x.ewm(span=n, adjust=True).mean())),
        ("lag", lambda n: (lambda x: x.shift(n))),
    ):
        if name.startswith(prefix):
            try:
                return maker(int(name[len(prefix):]))
            except ValueError:
                break
    return OP_UNARY.get(name)


# --- transform (de)serialization --------------------------------------------

def transform_to_config(t: BaseTransform) -> Dict[str, Any]:
    """Recursively serialize any transform tree to a JSON-able dict."""
    cfg: Dict[str, Any] = {
        "class": _class_path(t),
        "requires": list(getattr(t, "requires", [])),
        "produces": list(getattr(t, "produces", [])),
    }

    def _op_name(default):
        name = getattr(t, "op_name", None)
        if name:
            return name
        produced = t.produces[0] if isinstance(t.produces, list) else t.produces
        return produced.split("(")[0] or default

    if isinstance(t, (BinaryOpTransform, MinMaxOpTransform)):
        cfg["kind"] = "binary" if isinstance(t, BinaryOpTransform) else "minmax"
        cfg["op_name"] = _op_name("add")
        cfg["left"] = transform_to_config(t.left)
        cfg["right"] = transform_to_config(t.right)
        return cfg
    if isinstance(t, ConstantOpTransform):
        cfg["kind"] = "const"
        cfg["op_name"] = _op_name("add")
        cfg["constant"] = t.constant
        cfg["child"] = transform_to_config(t.transform)
        return cfg
    if isinstance(t, UnaryOpTransform):
        cfg["kind"] = "unary"
        cfg["op_name"] = _op_name("abs")
        cfg["child"] = transform_to_config(t.transform)
        return cfg
    if getattr(t, "_is_external_function", False):
        cfg["kind"] = "external"
        cfg["func"] = getattr(t, "func_path", None)
        cfg["args"] = _serialize_value(getattr(t, "args", []))
        cfg["kwargs"] = _serialize_value(getattr(t, "kwargs", {}))
        cfg["pass_numpy"] = bool(getattr(t, "pass_numpy", False))
        return cfg
    if isinstance(getattr(t, "transforms", None), (list, tuple)):
        cfg["kind"] = "compose"
        cfg["steps"] = [transform_to_config(s) for s in t.transforms]
        return cfg

    # Generic transform: record constructor params discoverable on instance
    cfg["kind"] = "transform"
    params: Dict[str, Any] = {}
    try:
        for name, p in inspect.signature(t.__class__.__init__).parameters.items():
            if name == "self":
                continue
            if name == "input_col":
                params[name] = t.requires[0]
            elif name == "input_cols":
                params[name] = list(t.requires)
            elif hasattr(t, name):
                params[name] = getattr(t, name)
    except (TypeError, ValueError) as e:  # pragma: no cover
        logger.warning(f"Failed to introspect params for {t}: {e}")
    cfg["params"] = {k: _serialize_value(v) for k, v in params.items()}
    return cfg


def transform_from_config(cfg: Dict[str, Any]) -> BaseTransform:
    """Rebuild a transform tree from its config dict."""
    kind = cfg.get("kind")
    if kind in ("binary", "minmax"):
        left = transform_from_config(cfg["left"])
        right = transform_from_config(cfg["right"])
        op_name = cfg.get("op_name", "add" if kind == "binary" else "min")
        table = OP_BINARY if kind == "binary" else OP_MINMAX
        op = table.get(op_name)
        if op is None:
            raise ValueError(f"Unsupported {kind} op: {op_name}")
        cls = BinaryOpTransform if kind == "binary" else MinMaxOpTransform
        return cls(left, right, op_name, op)
    if kind == "const":
        child = transform_from_config(cfg["child"])
        op_name = cfg.get("op_name", "add")
        const = cfg.get("constant")
        if op_name in OP_BINARY:
            op = OP_BINARY[op_name]
            fn = (lambda x, c: op(x, c)) if op_name in ("add", "sub", "mul", "div") \
                else (lambda x, c: c - x) if op_name == "rsub" else (lambda x, c: c / x)
            return ConstantOpTransform(child, const, op_name, fn)
        if op_name in OP_MINMAX:
            mm = OP_MINMAX[op_name]
            return ConstantOpTransform(child, const, op_name, lambda x, c: mm(x, c))
        raise ValueError(f"Unsupported const op: {op_name}")
    if kind == "unary":
        child = transform_from_config(cfg["child"])
        op_name = cfg.get("op_name", "abs")
        op = resolve_unary_op(op_name)
        if op is None:
            raise ValueError(f"Unsupported unary op: {op_name}")
        return UnaryOpTransform(child, op_name, op)
    if kind == "compose":
        from .kit import Compose
        return Compose(*[transform_from_config(s) for s in cfg.get("steps", [])])
    if kind == "external":
        from .transforms import ExternalFunction
        func_path = cfg.get("func")
        if not func_path:
            raise ValueError("ExternalFunction config requires 'func' path")
        reqs = cfg.get("requires", [])
        if not reqs:
            raise ValueError("ExternalFunction config missing 'requires'")
        input_cols = reqs[0] if len(reqs) == 1 else reqs
        produces = cfg.get("produces", [])
        output_cols = (produces[0] if len(produces) == 1 else produces) \
            if isinstance(produces, list) else produces
        return ExternalFunction(
            func_path, input_cols, output_cols,
            args=_deserialize_value(cfg.get("args", [])),
            kwargs=_deserialize_value(cfg.get("kwargs", {})),
            pass_numpy=bool(cfg.get("pass_numpy", False)))

    cls = _import_class(cfg["class"])
    params = {k: _deserialize_value(v) for k, v in cfg.get("params", {}).items()}
    try:
        return cls(**params)
    except Exception as e:
        logger.warning(f"Falling back to shallow reconstruction for {cfg['class']}: {e}")
        obj = cls.__new__(cls)
        obj.requires = cfg.get("requires", [])
        obj.produces = cfg.get("produces", [])
        for k, v in params.items():
            setattr(obj, k, v)
        return obj


# --- computation graph -------------------------------------------------------

class ComputationGraph:
    """DAG of feature dependencies with Kahn topological sort."""

    def __init__(self):
        self.edges: Dict[str, Set[str]] = {}
        self.nodes: Set[str] = set()

    def add_node(self, node: str):
        self.nodes.add(node)
        self.edges.setdefault(node, set())

    def add_edge(self, src: str, dst: str):
        self.add_node(src)
        self.add_node(dst)
        self.edges[src].add(dst)

    def topological_sort(self) -> List[str]:
        indeg = {n: 0 for n in self.nodes}
        for dests in self.edges.values():
            for d in dests:
                indeg[d] += 1
        ready = sorted(n for n, d in indeg.items() if d == 0)
        order = []
        while ready:
            n = ready.pop(0)
            order.append(n)
            for d in sorted(self.edges.get(n, ())):
                indeg[d] -= 1
                if indeg[d] == 0:
                    ready.append(d)
        return order

    def visualize(self) -> str:
        lines = ["ComputationGraph:"]
        for src in sorted(self.edges):
            lines.append(f"  {src} -> [{', '.join(sorted(self.edges[src]))}]")
        return "\n".join(lines)


def _flatten_requires(t: BaseTransform) -> List[str]:
    if isinstance(t, (BinaryOpTransform, MinMaxOpTransform)):
        return list(set(_flatten_requires(t.left) + _flatten_requires(t.right)))
    if isinstance(t, (UnaryOpTransform, ConstantOpTransform)):
        return _flatten_requires(t.transform)
    if isinstance(getattr(t, "transforms", None), (list, tuple)):
        return list(t.transforms[0].requires)
    return list(getattr(t, "requires", []))


def _child_output_names(t: BaseTransform) -> List[str]:
    if isinstance(t, (BinaryOpTransform, MinMaxOpTransform)):
        return [str(t.left.output_name), str(t.right.output_name)]
    if isinstance(t, (UnaryOpTransform, ConstantOpTransform)):
        return [str(t.transform.output_name)]
    if isinstance(getattr(t, "transforms", None), (list, tuple)):
        return [str(t.transforms[0].output_name)]
    return []


def build_feature_graph(features) -> ComputationGraph:
    """Infer the dependency DAG: input:<col> -> feature edges plus edges
    between features when one's output feeds another."""
    g = ComputationGraph()
    outputs = {str(f.name) for f in features if isinstance(f.name, str)}
    for f in features:
        out = str(f.name)
        g.add_node(out)
        reqs = _flatten_requires(f.transform)
        for r in reqs:
            g.add_edge(f"input:{r}", out)
        for child in _child_output_names(f.transform):
            if child in outputs and child != out:
                g.add_edge(child, out)
        for other in outputs:
            if other != out and other in reqs:
                g.add_edge(other, out)
    return g

"""Transform framework: declarative-dependency feature transforms.

Parity: /root/reference/finmlkit/feature/base.py — the same abstract
contract (``requires`` / ``produces`` column declarations, shape-typed
SISO/MISO/SIMO/MIMO subclasses, operator-algebra transforms with output
caching) with a TPU-first backend pair:

- ``"pd"``  : pandas implementation (readable, trusted reference path —
  plays the role of the reference's `_pd`)
- ``"jax"`` : XLA-compiled kernels from ``finmlkit_tpu.feature.kernels``
  (the native tier; the reference's `_nb` slot). ``backend="nb"`` is
  accepted as an alias so reference call sites work unchanged.

Output-naming conventions are identical to the reference: SISO ->
``{input}_{produces}`` (base.py:485-492), MISO/MIMO -> produces verbatim
(base.py:699-706), SIMO -> ``{input}_{p_i}`` (base.py:968-975); operator
transforms compose names like ``add(x,y)`` and short-circuit on cached
columns (base.py:1283-1298).
"""
from abc import ABC, abstractmethod
from typing import Callable, Sequence, Union

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..utils.log import get_logger

logger = get_logger(__name__)

_JAX_BACKENDS = ("jax", "nb")


class BaseTransform(ABC):
    """Abstract transform: declared inputs/outputs + backend dispatch."""

    requires: list
    produces: list

    def __init__(self, input_cols: Union[Sequence, str], output_cols: Union[Sequence, str]):
        assert isinstance(input_cols, (str, tuple, list)), \
            f"Input columns must be a string or a sequence of strings. Got {type(input_cols)}"
        assert isinstance(output_cols, (str, tuple, list)), \
            f"Output columns must be a string or a sequence of strings. Got {type(output_cols)}"
        self.requires = [input_cols] if isinstance(input_cols, str) else list(input_cols)
        self.produces = [output_cols] if isinstance(output_cols, str) else list(output_cols)

    @abstractmethod
    def __call__(self, x: pd.DataFrame, *, backend="jax"):
        ...

    @abstractmethod
    def _validate_input(self, x: pd.DataFrame) -> bool:
        ...

    @property
    @abstractmethod
    def output_name(self):
        ...


class CoreTransform(BaseTransform, ABC):
    """Backend-dispatching transform with temporal-data helpers."""

    def __call__(self, x: pd.DataFrame, *, backend="jax"):
        self._validate_input(x)
        if backend == "pd":
            return self._pd(x)
        if backend in _JAX_BACKENDS:
            return self._jax(x)
        raise ValueError(f"Unknown backend {backend!r}")

    @staticmethod
    def _check_datetime_index(x: pd.DataFrame) -> bool:
        if isinstance(x, pd.DataFrame):
            if not pd.api.types.is_datetime64_any_dtype(x.index):
                raise ValueError("Input DataFrame must have a datetime index for time-based features.")
        else:
            raise TypeError("Input must be a pandas DataFrame")
        return True

    def _get_timestamps(self, x: pd.DataFrame) -> np.ndarray:
        # whole-graph tracing (feature/fuse.py) feeds a _TraceFrame whose
        # timestamps are a traced int64 array
        trace_ts = getattr(x, "trace_ts", None)
        if trace_ts is not None:
            return trace_ts
        self._check_datetime_index(x)
        # pandas >= 3.0 may store datetime64[us]; normalize to ns epoch
        return x.index.values.astype("datetime64[ns]").astype(np.int64)

    # --- to be implemented by children ---
    @abstractmethod
    def _pd(self, x):
        ...

    @abstractmethod
    def _jax(self, x):
        ...


def _to_np(y):
    if isinstance(y, jnp.ndarray):
        return np.asarray(y)
    return y


class SISOTransform(CoreTransform, ABC):
    """Single input -> single output; name = ``{input}_{produces}``."""

    def __init__(self, input_col: str, output_col: str):
        super().__init__(input_col, output_col)

    def _validate_input(self, x):
        if not isinstance(x, pd.DataFrame):
            raise TypeError("Input must be a pandas DataFrame")
        if self.requires[0] not in x.columns:
            raise ValueError(f"Input column {self.requires[0]} not found in DataFrame")
        return True

    def _prepare_input(self, x: pd.DataFrame) -> np.ndarray:
        return x[self.requires[0]].values

    @property
    def output_name(self) -> str:
        return f"{self.requires[0]}_{self.produces[0]}"

    def _prepare_output(self, idx, y) -> pd.Series:
        if getattr(self, "_raw_out", False):  # whole-graph tracing
            return y
        return pd.Series(_to_np(y), index=idx, name=self.output_name)


class MISOTransform(CoreTransform, ABC):
    """Multiple inputs -> single output; name = produces verbatim."""

    def __init__(self, input_cols: Sequence, output_col: str):
        super().__init__(input_cols, output_col)

    def _validate_input(self, x):
        if not isinstance(x, pd.DataFrame):
            raise TypeError("Input must be a pandas DataFrame")
        missing = [c for c in self.requires if c not in x.columns]
        if missing:
            raise ValueError(f"Input columns {missing} not found in DataFrame")
        return True

    def _prepare_input(self, x: pd.DataFrame) -> dict:
        return {c: x[c].values for c in self.requires}

    @property
    def output_name(self) -> str:
        return self.produces[0]

    def _prepare_output(self, idx, y) -> pd.Series:
        if getattr(self, "_raw_out", False):  # whole-graph tracing
            return y
        return pd.Series(_to_np(y), index=idx, name=self.output_name)


class SIMOTransform(CoreTransform, ABC):
    """Single input -> multiple outputs; names = ``{input}_{p_i}``."""

    def __init__(self, input_col: str, output_cols: Sequence):
        super().__init__(input_col, output_cols)

    def _validate_input(self, x):
        if not isinstance(x, pd.DataFrame):
            raise TypeError("Input must be a pandas DataFrame")
        if self.requires[0] not in x.columns:
            raise ValueError(f"Input column {self.requires[0]} not found in DataFrame")
        return True

    def _prepare_input(self, x: pd.DataFrame) -> np.ndarray:
        return x[self.requires[0]].values

    @property
    def output_name(self) -> list:
        return [f"{self.requires[0]}_{c}" for c in self.produces]

    def _prepare_output(self, idx, y) -> tuple:
        if len(y) != len(self.produces):
            raise ValueError(f"Expected {len(self.produces)} outputs, got {len(y)}")
        if getattr(self, "_raw_out", False):  # whole-graph tracing
            return tuple(y)
        return tuple(pd.Series(_to_np(yi), index=idx, name=nm)
                     for yi, nm in zip(y, self.output_name))


class MIMOTransform(CoreTransform, ABC):
    """Multiple inputs -> multiple outputs; names = produces verbatim."""

    def __init__(self, input_cols: Sequence, output_cols: Sequence):
        super().__init__(input_cols, output_cols)

    def _validate_input(self, x):
        if not isinstance(x, pd.DataFrame):
            raise TypeError("Input must be a pandas DataFrame")
        missing = [c for c in self.requires if c not in x.columns]
        if missing:
            raise ValueError(f"Input columns {missing} not found in DataFrame")
        return True

    def _prepare_input(self, x: pd.DataFrame) -> dict:
        return {c: x[c].values for c in self.requires}

    @property
    def output_name(self) -> list:
        return list(self.produces)

    def _prepare_output(self, idx, y) -> tuple:
        if len(y) != len(self.produces):
            raise ValueError(f"Expected {len(self.produces)} outputs, got {len(y)}")
        if getattr(self, "_raw_out", False):  # whole-graph tracing
            return tuple(y)
        return tuple(pd.Series(_to_np(yi), index=idx, name=nm)
                     for yi, nm in zip(y, self.output_name))


# ---------------------------------------------------------------------------
# Operator-algebra transforms (cache-aware composition)
# ---------------------------------------------------------------------------

class _OpTransformBase(BaseTransform, ABC):
    """Shared cache-short-circuit logic for operator transforms."""

    @property
    def output_name(self):
        if isinstance(self.produces, list) and len(self.produces) == 1:
            return self.produces[0]
        return self.produces

    def _cached(self, x):
        out_name = self.output_name if isinstance(self.output_name, str) else self.produces[0]
        if isinstance(x, pd.DataFrame) and out_name in x.columns:
            return x[out_name]
        return None

    @staticmethod
    def _child_result(child, x, backend):
        if (isinstance(x, pd.DataFrame) and isinstance(child.output_name, str)
                and child.output_name in x.columns):
            return x[child.output_name]
        return child(x, backend=backend)


class BinaryOpTransform(_OpTransformBase):
    """Elementwise binary op between two transforms' outputs."""

    def __init__(self, left: BaseTransform, right: BaseTransform,
                 op_name: str, op_func: Callable):
        combined = list(set(left.requires + right.requires))
        super().__init__(combined, f"{op_name}({left.output_name},{right.output_name})")
        self.left, self.right = left, right
        self.op_func, self.op_name = op_func, op_name

    def _validate_input(self, x):
        for side, t in (("Left", self.left), ("Right", self.right)):
            if not isinstance(t, (SISOTransform, MISOTransform, _OpTransformBase)):
                raise TypeError(f"{side} transform must be SISO or MISO for binary OP, got {type(t)}")
        return self.left._validate_input(x) and self.right._validate_input(x)

    def __call__(self, x, *, backend="jax"):
        cached = self._cached(x)
        if cached is not None:
            return cached
        l = self._child_result(self.left, x, backend)
        r = self._child_result(self.right, x, backend)
        result = self.op_func(l, r)
        result.name = self.output_name
        return result


class ConstantOpTransform(_OpTransformBase):
    """Elementwise op between a transform's output and a constant."""

    def __init__(self, transform: BaseTransform, constant: float,
                 op_name: str, op_func: Callable):
        super().__init__(transform.requires,
                         f"{op_name}({transform.output_name},{constant})")
        self.transform = transform
        self.constant = constant
        self.op_func, self.op_name = op_func, op_name

    def _validate_input(self, x):
        return self.transform._validate_input(x)

    def __call__(self, x, *, backend="jax"):
        cached = self._cached(x)
        if cached is not None:
            return cached
        base = self._child_result(self.transform, x, backend)
        result = self.op_func(base, self.constant)
        result.name = self.output_name
        return result


class UnaryOpTransform(_OpTransformBase):
    """Elementwise unary op on a transform's output."""

    def __init__(self, transform: BaseTransform, op_name: str, op_func: Callable):
        super().__init__(transform.requires, f"{op_name}({transform.output_name})")
        self.transform = transform
        self.op_func, self.op_name = op_func, op_name

    def _validate_input(self, x):
        return self.transform._validate_input(x)

    def __call__(self, x, *, backend="jax"):
        cached = self._cached(x)
        if cached is not None:
            return cached
        base = self._child_result(self.transform, x, backend)
        result = self.op_func(base)
        result.name = self.output_name
        return result


class MinMaxOpTransform(_OpTransformBase):
    """Elementwise min/max between two transforms' outputs."""

    def __init__(self, left: BaseTransform, right: BaseTransform,
                 op_name: str, op_func: Callable):
        combined = list(set(left.requires + right.requires))
        super().__init__(combined, f"{op_name}({left.output_name},{right.output_name})")
        self.left, self.right = left, right
        self.op_func, self.op_name = op_func, op_name

    def _validate_input(self, x):
        for side, t in (("Left", self.left), ("Right", self.right)):
            if not isinstance(t, (SISOTransform, MISOTransform, _OpTransformBase)):
                raise TypeError(f"{side} transform must be SISO or MISO for "
                                f"{self.produces[0]} OP, got {type(t)}")
        return self.left._validate_input(x) and self.right._validate_input(x)

    def __call__(self, x, *, backend="jax"):
        cached = self._cached(x)
        if cached is not None:
            return cached
        l = self._child_result(self.left, x, backend)
        r = self._child_result(self.right, x, backend)
        result = self.op_func(l, r)
        result.name = self.output_name
        return result

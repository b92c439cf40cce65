"""Pallas TPU prefix-sum kernel.

XLA's native cumsum lowering compiles pathologically slowly on this TPU
(~6s for int32, ~32s for int64, minutes for f64 — per program, any size)
while executing fine. This kernel sidesteps the XLA scan lowering with an
explicitly chunked scan: a sequential grid walks (CHUNK_ROWS, LANES)
blocks, computes a block-local inclusive cumsum, and carries the running
total across grid steps in a VMEM scratch cell. Compiles in ~1s and runs
at HBM bandwidth.

int64 inputs are processed as (hi, lo) int32 pairs (Mosaic has no native
64-bit vector ops): lo accumulates mod 2^32, hi accumulates the signed
high words plus carries counted from unsigned lo overflow — exact
two's-complement int64 prefix sums.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 64  # 64*128 = 8192 elements per grid step


def _zero_i32():
    # index_map outputs must stay int32; a bare `0` traces as int64
    # under jax_enable_x64 and fails Mosaic legalization
    import numpy as _np
    return _np.int32(0)


def _block_cumsum(x):
    """Inclusive cumsum of a (R, L) block in row-major order."""
    r, l = x.shape
    # within-row inclusive cumsum via log-shifts along lanes
    import numpy as _np
    y = x
    shift = 1
    while shift < l:
        y = y + jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (r, l), 1) >= shift,
            pltpu.roll(y, _np.int32(shift), 1), jnp.zeros_like(y))
        shift *= 2
    # add exclusive prefix of row totals to each row
    totals = y[:, l - 1:l]  # (r, 1)
    z = totals
    shift = 1
    while shift < r:
        z = z + jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) >= shift,
            pltpu.roll(z, _np.int32(shift), 0), jnp.zeros_like(z))
        shift *= 2
    row_prefix = z - totals  # exclusive
    return y + row_prefix


def _ffill_kernel(v_ref, m_ref, o_ref, carry):
    """Forward-fill kernel: value at the latest set mask position.

    Positions before the stream's first valid element fill with the
    GLOBAL first element's value (matching the reference's
    ``sigma[clip(last_valid, 0, n-1)]`` semantics) — XLA's formulation
    of that gather costs ~37 ns/element on this TPU (the hidden 1.45 s
    inside the round-4 CUSUM bar indexer)."""
    from .fused_scan import _c_last, _scan2d

    import numpy as _np

    i = pl.program_id(0)
    v = v_ref[...]
    m = m_ref[...]
    # NOTE: bare int literals in jnp.where recurse in the Mosaic
    # lowering under x64 (weak int64 constant); use np.int32
    fill, seen = _scan2d((jnp.where(m != 0, v, _np.int32(0)), m), _c_last)
    cv = jnp.where(i == 0, v[0, 0], carry[0, 0])
    out = jnp.where(seen != 0, fill, cv)
    o_ref[...] = out
    carry[0, 0] = out[_ROWS - 1, _LANES - 1]


@partial(jax.jit, static_argnames=("interpret",))
def _ffill_2d(v, m, interpret=False):
    n_rows = v.shape[0]
    grid = n_rows // _ROWS
    return pl.pallas_call(
        _ffill_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, _zero_i32())),
                  pl.BlockSpec((_ROWS, _LANES), lambda i: (i, _zero_i32()))],
        out_specs=pl.BlockSpec((_ROWS, _LANES), lambda i: (i, _zero_i32())),
        out_shape=jax.ShapeDtypeStruct(v.shape, jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(v, m)


@partial(jax.jit, static_argnames=("n_pad",))
def _ffill_prep(values, valid, n_pad: int):
    pad = n_pad - values.shape[0]
    bits = jax.lax.bitcast_convert_type(values.astype(jnp.float32),
                                        jnp.int32)
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((pad,), jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), jnp.bool_)])
    return bits.reshape(-1, _LANES), valid.astype(jnp.int32).reshape(-1, _LANES)


def fast_ffill(values, valid, interpret: bool | None = None):
    """Forward-fill ``values`` where ``valid`` is False (float32).

    Positions before the first valid element take ``values[0]``
    (reference clip-to-0 semantics). Falls back to the cummax+gather
    formulation off-TPU.
    """
    n = values.shape[0]
    if interpret is None:
        if not _runs_on_tpu(values):
            idx = jnp.arange(n)
            last_valid = jax.lax.cummax(jnp.where(valid, idx, -1))
            return values[jnp.clip(last_valid, 0, n - 1)]
        interpret = False
    block = _ROWS * _LANES
    n_pad = ((n + block - 1) // block) * block
    bits, m = _ffill_prep(values, valid, n_pad)
    out = _ffill_2d(bits, m, interpret=interpret)
    return jax.lax.bitcast_convert_type(
        out.reshape(-1)[:n], jnp.float32)


def _cumsum_kernel(x_ref, o_ref, carry):
    i = pl.program_id(0)
    prev = jnp.where(i == 0, jnp.zeros((), o_ref.dtype), carry[0, 0])
    blk = _block_cumsum(x_ref[...])
    o_ref[...] = blk + prev
    carry[0, 0] = prev + blk[_ROWS - 1, _LANES - 1]


@partial(jax.jit, static_argnames=("interpret",))
def _cumsum_2d(x, interpret=False):
    n_rows = x.shape[0]
    grid = n_rows // _ROWS
    return pl.pallas_call(
        _cumsum_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, _zero_i32()))],
        out_specs=pl.BlockSpec((_ROWS, _LANES), lambda i: (i, _zero_i32())),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), x.dtype)],
        interpret=interpret,
    )(x)


def _cumsum_kernel_i64(hi_ref, lo_ref, ohi_ref, olo_ref, carry):
    i = pl.program_id(0)
    zero = jnp.zeros((), jnp.int32)
    lo = lo_ref[...]
    hi = hi_ref[...]
    lo_sum = _block_cumsum(lo)          # mod 2^32 prefix of low words
    hi_sum = _block_cumsum(hi)
    # carries: number of unsigned overflows among low-word partial sums.
    # overflow happened at step k iff lo_sum[k] (unsigned) < lo[k] (unsigned)
    bias = jnp.int32(-2147483648)  # compare as unsigned via bias flip
    ovf = ((lo_sum + bias) < (lo + bias)).astype(jnp.int32)
    ovf_prefix = _block_cumsum(ovf)

    clo = jnp.where(i == 0, zero, carry[0, 0])
    chi = jnp.where(i == 0, zero, carry[0, 1])
    new_lo = lo_sum + clo
    # adding the carry-in may overflow once more
    ovf2 = ((new_lo + bias) < (lo_sum + bias)).astype(jnp.int32) * (clo != 0).astype(jnp.int32)
    olo_ref[...] = new_lo
    ohi_ref[...] = hi_sum + ovf_prefix + chi + ovf2

    last = _ROWS - 1
    carry[0, 0] = new_lo[last, _LANES - 1]
    carry[0, 1] = (hi_sum + ovf_prefix + chi + ovf2)[last, _LANES - 1]


@partial(jax.jit, static_argnames=("interpret",))
def _cumsum_2d_i64(hi, lo, interpret=False):
    n_rows = hi.shape[0]
    grid = n_rows // _ROWS
    return pl.pallas_call(
        _cumsum_kernel_i64,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, _zero_i32())),
                  pl.BlockSpec((_ROWS, _LANES), lambda i: (i, _zero_i32()))],
        out_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, _zero_i32())),
                   pl.BlockSpec((_ROWS, _LANES), lambda i: (i, _zero_i32()))],
        out_shape=[jax.ShapeDtypeStruct(hi.shape, jnp.int32),
                   jax.ShapeDtypeStruct(lo.shape, jnp.int32)],
        scratch_shapes=[pltpu.SMEM((1, 2), jnp.int32)],
        interpret=interpret,
    )(hi, lo)


def _runs_on_tpu(x) -> bool:
    """True when ``x`` will execute on a TPU device.

    Checks the concrete array's committed device first — under
    ``jax.default_device(cpu)`` on a TPU-default process (virtual CPU
    mesh dryruns), ``jax.default_backend()`` still reports "tpu" while
    the data lives on CPU, where the Pallas kernel can't compile.
    """
    devices = getattr(x, "devices", None)
    if devices is not None:
        try:
            return any(d.platform == "tpu" for d in devices())
        except Exception:
            pass
    return jax.default_backend() == "tpu"


def fast_cumsum(x, interpret: bool | None = None):
    """Inclusive prefix sum via the Pallas chunked-scan kernel.

    Falls back to jnp.cumsum off-TPU (Pallas interpret mode is slower
    than XLA:CPU's native scan). Input is padded to a block multiple
    internally; any 1-D int32/int64/float32 array.
    """
    if interpret is None:
        if not _runs_on_tpu(x):
            return jnp.cumsum(x)
        interpret = False
    n = x.shape[0]
    if x.dtype == jnp.int64:
        hi, lo = _prep_i64(x[None, :])
        ohi, olo = _cumsum_2d_i64(hi[0], lo[0], interpret=interpret)
        return _finish_combined(ohi[None], olo[None], n=n)[0]
    out = _cumsum_2d(_prep_any(x[None, :])[0], interpret=interpret)
    return _finish_any(out[None], n=n)[0]


# ---------------------------------------------------------------------------
# Multi-column variant: one kernel call scans C independent columns
# ---------------------------------------------------------------------------

def _cumsum_kernel_cols(x_ref, o_ref, carry):
    i = pl.program_id(1)  # chunk index within the current column
    prev = jnp.where(i == 0, jnp.zeros((), o_ref.dtype), carry[0, 0])
    blk = _block_cumsum(x_ref[0])
    o_ref[0] = blk + prev
    carry[0, 0] = prev + blk[_ROWS - 1, _LANES - 1]


@partial(jax.jit, static_argnames=("interpret",))
def _cumsum_3d(x, interpret=False):
    c, n_rows, _ = x.shape
    grid = (c, n_rows // _ROWS)
    zero = _zero_i32()
    return pl.pallas_call(
        _cumsum_kernel_cols,
        grid=grid,
        in_specs=[pl.BlockSpec((1, _ROWS, _LANES), lambda ci_, i: (ci_, i, zero))],
        out_specs=pl.BlockSpec((1, _ROWS, _LANES), lambda ci_, i: (ci_, i, zero)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), x.dtype)],
        interpret=interpret,
    )(x)


def _cumsum_kernel_cols_i64(hi_ref, lo_ref, ohi_ref, olo_ref, carry):
    i = pl.program_id(1)
    zero = jnp.zeros((), jnp.int32)
    lo = lo_ref[0]
    hi = hi_ref[0]
    lo_sum = _block_cumsum(lo)
    hi_sum = _block_cumsum(hi)
    bias = jnp.int32(-2147483648)
    ovf = ((lo_sum + bias) < (lo + bias)).astype(jnp.int32)
    ovf_prefix = _block_cumsum(ovf)
    clo = jnp.where(i == 0, zero, carry[0, 0])
    chi = jnp.where(i == 0, zero, carry[0, 1])
    new_lo = lo_sum + clo
    ovf2 = ((new_lo + bias) < (lo_sum + bias)).astype(jnp.int32) * (clo != 0).astype(jnp.int32)
    olo_ref[0] = new_lo
    new_hi = hi_sum + ovf_prefix + chi + ovf2
    ohi_ref[0] = new_hi
    last = _ROWS - 1
    carry[0, 0] = new_lo[last, _LANES - 1]
    carry[0, 1] = new_hi[last, _LANES - 1]


@partial(jax.jit, static_argnames=("interpret",))
def _cumsum_3d_i64(hi, lo, interpret=False):
    c, n_rows, _ = hi.shape
    grid = (c, n_rows // _ROWS)
    zero = _zero_i32()
    spec = pl.BlockSpec((1, _ROWS, _LANES), lambda ci_, i: (ci_, i, zero))
    return pl.pallas_call(
        _cumsum_kernel_cols_i64,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(hi.shape, jnp.int32),
                   jax.ShapeDtypeStruct(lo.shape, jnp.int32)],
        scratch_shapes=[pltpu.SMEM((1, 2), jnp.int32)],
        interpret=interpret,
    )(hi, lo)


@jax.jit
def _prep_i64(x):
    """Pad to a block multiple and split into (hi, lo) int32 3-D blocks
    in ONE dispatch (eager pad/reshape chains cost seconds each over the
    remote transport)."""
    c, n = x.shape
    block = _ROWS * _LANES
    pad = (-n) % block
    xp = jnp.concatenate([x, jnp.zeros((c, pad), x.dtype)], axis=1) if pad else x
    hi = (xp >> 32).astype(jnp.int32).reshape(c, -1, _LANES)
    lo = xp.astype(jnp.uint32).astype(jnp.int32).reshape(c, -1, _LANES)
    return hi, lo


@jax.jit
def _prep_any(x):
    c, n = x.shape
    block = _ROWS * _LANES
    pad = (-n) % block
    xp = jnp.concatenate([x, jnp.zeros((c, pad), x.dtype)], axis=1) if pad else x
    return xp.reshape(c, -1, _LANES)


@partial(jax.jit, static_argnames=("n",))
def _finish_pair(ohi, olo, n: int):
    c = ohi.shape[0]
    return ohi.reshape(c, -1)[:, :n], olo.reshape(c, -1)[:, :n]


@partial(jax.jit, static_argnames=("n",))
def _finish_combined(ohi, olo, n: int):
    c = ohi.shape[0]
    out = (ohi.reshape(c, -1).astype(jnp.int64) << 32) | \
        olo.reshape(c, -1).astype(jnp.uint32).astype(jnp.int64)
    return out[:, :n]


@partial(jax.jit, static_argnames=("n",))
def _finish_any(o, n: int):
    return o.reshape(o.shape[0], -1)[:, :n]


@jax.jit
def combine_i64(hi, lo):
    """Recombine (hi, lo) int32 prefix pairs into int64 values."""
    return (hi.astype(jnp.int64) << 32) | lo.astype(jnp.uint32).astype(jnp.int64)


def fast_cumsum_cols(x, interpret: bool | None = None, as_pair: bool = False):
    """Columnwise inclusive prefix sums: x is (C, n); each row scanned
    independently in ONE kernel launch. Same dtype support and TPU-only
    policy as :func:`fast_cumsum`.

    For int64 inputs, ``as_pair=True`` returns the raw ``(hi, lo)`` int32
    prefix pair (shape (C, n) each) without materializing the recombined
    int64 array — callers that only gather a few positions (bar-boundary
    sums) recombine with :func:`combine_i64` on the gathered slices,
    halving peak HBM at monthly trade counts.
    """
    if interpret is None:
        if not _runs_on_tpu(x):
            out = jnp.cumsum(x, axis=1)
            if as_pair and x.dtype == jnp.int64:
                return ((out >> 32).astype(jnp.int32),
                        out.astype(jnp.uint32).astype(jnp.int32))
            return out
        interpret = False
    c, n = x.shape
    if x.dtype == jnp.int64:
        hi, lo = _prep_i64(x)
        ohi, olo = _cumsum_3d_i64(hi, lo, interpret=interpret)
        del hi, lo
        if as_pair:
            return _finish_pair(ohi, olo, n=n)
        return _finish_combined(ohi, olo, n=n)
    out = _cumsum_3d(_prep_any(x), interpret=interpret)
    return _finish_any(out, n=n)

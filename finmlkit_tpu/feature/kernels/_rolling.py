"""Causal rolling-window primitives built on lax.reduce_window.

These replace the reference's per-window ``prange`` loops. All helpers
return full-length arrays where position i reduces over the trailing
window ``[i-window+1, i]``; the caller masks the warm-up region.
NaN-aware variants reduce a zero-filled copy plus a validity count so a
NaN only affects windows that contain it (matching the reference's
per-window NaN handling rather than prefix-sum poisoning).
"""
import jax
import jax.numpy as jnp


def roll_reduce(x, window: int, op, init):
    """Causal rolling reduce; leading windows padded with `init`."""
    return jax.lax.reduce_window(
        x, init, op, (window,), (1,), [(window - 1, 0)])


def roll_sum(x, window: int):
    return roll_reduce(x, window, jax.lax.add, 0.0)


def roll_max(x, window: int):
    return roll_reduce(x, window, jax.lax.max, -jnp.inf)


def roll_min(x, window: int):
    return roll_reduce(x, window, jax.lax.min, jnp.inf)


def roll_nansum_count(x, window: int):
    """(sum of non-NaN, count of non-NaN) over trailing windows."""
    valid = ~jnp.isnan(x)
    s = roll_sum(jnp.where(valid, x, 0.0), window)
    c = roll_sum(valid.astype(x.dtype), window)
    return s, c


def warmup_nan(y, window: int):
    """Set the first window-1 positions to NaN (reference convention)."""
    idx = jnp.arange(y.shape[0])
    return jnp.where(idx < window - 1, jnp.nan, y)


def sliding_windows(x, window: int, fill=jnp.nan):
    """Materialize (n, window) trailing windows (col j = x[i-window+1+j]).

    O(n*window) memory — use only for order statistics (median) on
    bar-level series where window is modest.
    """
    n = x.shape[0]
    cols = [jnp.concatenate([jnp.full((window - 1 - j,), fill, x.dtype),
                             x[: n - (window - 1 - j)]])
            for j in range(window)]
    return jnp.stack(cols, axis=1)

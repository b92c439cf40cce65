"""Time-of-day / day-of-week cyclical cues and session flags.

Parity: /root/reference/finmlkit/feature/core/time.py:5-62 — pure
elementwise VPU work.
"""
import jax
import jax.numpy as jnp


@jax.jit
def time_cues(timestamps):
    """Returns (sin_td, cos_td, sin_dw, cos_dw, asia, eu, us, trans, top_hr)."""
    ts = jnp.asarray(timestamps, jnp.int64) // 1_000_000_000  # seconds
    twopi = 2.0 * jnp.pi

    sec_in_day = ts % 86400
    phase = twopi * (sec_in_day.astype(jnp.float64) / 86400.0)
    sin_td = jnp.sin(phase)
    cos_td = jnp.cos(phase)

    day_week = (ts // 86400 + 3) % 7  # Unix epoch was Thursday
    phase_w = twopi * (day_week.astype(jnp.float64) / 7.0)
    sin_dw = jnp.sin(phase_w)
    cos_dw = jnp.cos(phase_w)

    hour = sec_in_day // 3600
    asia = (hour >= 0) & (hour < 8)
    eu = (hour >= 7) & (hour < 15)
    us = (hour >= 13) & (hour < 21)

    minute = (sec_in_day % 3600) // 60
    trans = ((hour == 0) | (hour == 7) | (hour == 13)) & (minute == 0)
    top_hr = minute == 0

    return sin_td, cos_td, sin_dw, cos_dw, asia, eu, us, trans, top_hr

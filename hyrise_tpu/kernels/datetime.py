"""Civil-calendar device kernels: int32 days-since-epoch <-> (y, m, d).

Pure integer arithmetic (Euclidean-era algorithm), fully vectorized on the
VPU — no host round trips for EXTRACT or date+interval arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def civil_from_days(days: jax.Array):
    """days since 1970-01-01 -> (year, month, day) int32 arrays."""
    z = days.astype(jnp.int64) + 719468
    era = jnp.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = jnp.where(mp < 10, mp + 3, mp - 9)
    y = y + (m <= 2)
    return y.astype(jnp.int32), m.astype(jnp.int32), d.astype(jnp.int32)


def days_from_civil(y: jax.Array, m: jax.Array, d: jax.Array) -> jax.Array:
    """(year, month, day) -> days since 1970-01-01 (int32)."""
    y = y.astype(jnp.int64) - (m <= 2)
    era = jnp.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9).astype(jnp.int64)
    doy = (153 * mp + 2) // 5 + d.astype(jnp.int64) - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return (era * 146097 + doe - 719468).astype(jnp.int32)


def add_months(days: jax.Array, months) -> jax.Array:
    """date + n months with end-of-month clamping (SQL interval semantics)."""
    y, m, d = civil_from_days(days)
    total = (y.astype(jnp.int64) * 12 + (m.astype(jnp.int64) - 1)) + months
    ny = (total // 12).astype(jnp.int32)
    nm = (total % 12).astype(jnp.int32) + 1
    # clamp day to the target month's length
    last = _days_in_month(ny, nm)
    nd = jnp.minimum(d, last)
    return days_from_civil(ny, nm, nd)


def _days_in_month(y: jax.Array, m: jax.Array) -> jax.Array:
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    lengths = jnp.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31],
                        dtype=jnp.int32)
    base = jnp.take(lengths, m - 1)
    return jnp.where((m == 2) & leap, 29, base)

"""Hand-written Pallas TPU kernels for the hottest operator inner loops.

These complement the XLA-compiled stages: where XLA's fusions are already
bandwidth-bound (elementwise scans) Pallas adds little, but grouping can
ride the MXU — a one-hot matmul turns dense-slot aggregation into a
(block x slots) systolic-array contraction instead of scatter-adds.

All kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 2048


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------- group sum


def _group_sum_kernel(slots_ref, values_ref, mask_ref, out_ref):
    """One grid step aggregates BLOCK_ROWS rows into (1, n_slots) sums via
    a one-hot MXU contraction; the output block revisits every step and
    accumulates (ref pattern: aggregate partials; guide §Grid)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    slots = slots_ref[:]                       # (1, B) int32
    vals = jnp.where(mask_ref[:], values_ref[:], 0.0)   # (1, B) f32
    n_slots = out_ref.shape[1]
    # one-hot (B, S) on the fly; MXU contracts (1, B) x (B, S) -> (1, S)
    onehot = (
        slots.reshape(-1, 1)
        == jax.lax.broadcasted_iota(jnp.int32, (slots.shape[1], n_slots), 1)
    ).astype(jnp.float32)
    out_ref[:] += jnp.dot(vals, onehot, preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("n_slots",))
def pallas_dense_group_sum(slots: jax.Array, values: jax.Array,
                           mask: jax.Array, n_slots: int) -> jax.Array:
    """Dense grouped sum: out[s] = sum(values[i] where slots[i]==s & mask).

    slots int32 (N,), values f32 (N,), mask bool (N,); inputs pad to a
    BLOCK_ROWS multiple here (padding rows carry mask=False).  The MXU
    contraction accumulates in f32 — callers needing f64-exact sums stay
    on the XLA segment_sum path (kernels/aggregates.py gates on
    HYRISE_TPU_PALLAS)."""
    n = values.shape[0]
    pad = (-n) % BLOCK_ROWS
    if pad:
        slots = jnp.concatenate([slots, jnp.zeros(pad, slots.dtype)])
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
        n += pad
    # Mosaic tiles the minor dimension in 128-lane registers: the slot
    # axis pads up to a lane multiple and slices back after the call
    s_pad = max(-(-n_slots // 128) * 128, 128)
    grid = (n // BLOCK_ROWS,)
    out = pl.pallas_call(
        _group_sum_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_ROWS), lambda i: (0 * i, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_ROWS), lambda i: (0 * i, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_ROWS), lambda i: (0 * i, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad), lambda i: (0 * i, 0 * i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
        interpret=_interpret(),
    )(
        slots.reshape(1, -1).astype(jnp.int32),
        values.reshape(1, -1).astype(jnp.float32),
        mask.reshape(1, -1),
    )
    return out[0, :n_slots]


# ------------------------------------------------------------- scan+reduce


def _scan_reduce_kernel(date_ref, disc_ref, qty_ref, price_ref,
                        bounds_ref, out_ref):
    """Fused selective scan: 3-predicate filter + masked sum + count in
    one HBM pass.  All predicate constants arrive via SMEM (bounds_ref),
    so one compiled kernel serves every parameterization."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    date_lo = bounds_ref[0, 0]
    date_hi = bounds_ref[0, 1]
    disc_lo = bounds_ref[0, 2]
    disc_hi = bounds_ref[0, 3]
    qty_hi = bounds_ref[0, 4]
    sd = date_ref[:]
    dc = disc_ref[:]
    qt = qty_ref[:]
    pr = price_ref[:]
    m = (
        (sd >= date_lo) & (sd < date_hi)
        & (dc >= disc_lo) & (dc <= disc_hi) & (qt < qty_hi)
    )
    revenue = jnp.sum(jnp.where(m, pr * dc, 0.0))
    count = jnp.sum(m.astype(jnp.float32))
    # full-vector accumulate (scalar VMEM stores do not lower on Mosaic);
    # lane 0 carries the revenue, lane 1 the count
    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:] += (jnp.where(lane == 0, revenue, 0.0)
                   + jnp.where(lane == 1, count, 0.0))


@jax.jit
def pallas_scan_reduce(date: jax.Array, discount: jax.Array,
                       quantity: jax.Array, price: jax.Array,
                       date_lo, date_hi, disc_lo, disc_hi,
                       qty_hi) -> jax.Array:
    """(sum(price*discount), match_count) over rows passing
    date in [date_lo, date_hi) AND discount in [disc_lo, disc_hi] AND
    quantity < qty_hi — the TPC-H Q6 scan shape with every constant a
    runtime parameter."""
    n = date.shape[0]
    pad = (-n) % BLOCK_ROWS
    if pad:
        # padded dates sit outside any real [lo, hi) window
        date = jnp.concatenate(
            [date, jnp.full(pad, jnp.iinfo(jnp.int32).min, date.dtype)])
        discount = jnp.concatenate([discount, jnp.zeros(pad, discount.dtype)])
        quantity = jnp.concatenate([quantity, jnp.zeros(pad, quantity.dtype)])
        price = jnp.concatenate([price, jnp.zeros(pad, price.dtype)])
        n += pad
    grid = (n // BLOCK_ROWS,)
    bounds = jnp.stack([
        jnp.asarray(date_lo, jnp.float32), jnp.asarray(date_hi, jnp.float32),
        jnp.asarray(disc_lo, jnp.float32), jnp.asarray(disc_hi, jnp.float32),
        jnp.asarray(qty_hi, jnp.float32),
    ]).reshape(1, 5)
    out = pl.pallas_call(
        _scan_reduce_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_ROWS), lambda i: (0 * i, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_ROWS), lambda i: (0 * i, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_ROWS), lambda i: (0 * i, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_ROWS), lambda i: (0 * i, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5), lambda i: (0 * i, 0 * i), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0 * i, 0 * i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=_interpret(),
    )(
        date.reshape(1, -1).astype(jnp.float32),
        discount.reshape(1, -1).astype(jnp.float32),
        quantity.reshape(1, -1).astype(jnp.float32),
        price.reshape(1, -1).astype(jnp.float32),
        bounds,
    )
    return out[0, :2]

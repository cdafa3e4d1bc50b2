"""Selection-mask primitives: count + compact (mask -> gather indices).

This is the TPU analogue of the reference's PosList materialization
(ref: storage/pos_lists/row_id_pos_list.hpp): a boolean mask over rows is
turned into a dense, padded index vector via count -> exclusive-scan ->
gather, keeping every shape static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def mask_count(mask: jax.Array) -> jax.Array:
    return jnp.sum(mask, dtype=jnp.int64)


@partial(jax.jit, static_argnames=("out_size",))
def mask_to_indices(mask: jax.Array, out_size: int) -> jax.Array:
    """Indices of True entries, padded with capacity (out-of-range) so
    downstream gathers of padding rows are clamped but detectable."""
    n = mask.shape[0]
    (idx,) = jnp.nonzero(mask, size=out_size, fill_value=n - 1)
    return idx


@partial(jax.jit, static_argnames=("out_size",))
def mask_to_indices_fill_negative(mask: jax.Array, out_size: int) -> jax.Array:
    (idx,) = jnp.nonzero(mask, size=out_size, fill_value=-1)
    return idx


def padding_mask(n: int, capacity: int) -> jax.Array:
    """True for real rows [0, n), False for padding."""
    return jnp.arange(capacity) < n

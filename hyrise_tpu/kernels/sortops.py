"""Multi-key sort with SQL null ordering as one fused lexicographic
device sort.

The reference sorts by iterated std::stable_sort per sort definition
(ref: operators/sort.cpp:423); on TPU we instead build one
`jax.lax.sort` call over transformed key operands (lexicographic via
num_keys), which XLA lowers to a single fused bitonic/merge sort:

- DESC integer keys are bitwise-complemented (~x reverses order exactly,
  including INT_MIN); DESC float keys are order-negated via their sign-aware
  integer bit pattern.
- NULL ordering becomes a leading 1-bit flag key per sort column
  (ref: types.hpp:219 four SortMode variants).
- Padding rows get a leading flag sorting them last, so the first n output
  slots are exactly the sorted real rows.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hyrise_tpu.types import SortMode


def _order_key(data: jax.Array, ascending: bool) -> jax.Array:
    """Transform values so an ascending sort gives the requested order.

    Floats stay floats (lax.sort compares them natively — exact, and
    negation flips the order exactly); integers use bitwise complement for
    DESC.  No 64-bit bitcasts: XLA:TPU's X64 rewriter cannot lower
    bitcast-convert on emulated 64-bit element types."""
    if jnp.issubdtype(data.dtype, jnp.floating):
        return data if ascending else -data
    return data if ascending else ~data


def sort_permutation(
    keys: Sequence[Tuple[jax.Array, Optional[jax.Array]]],
    modes: Sequence[SortMode],
    n: int,
) -> jax.Array:
    """Sort rows [0, n); padding rows sort last (see masked variant)."""
    capacity = keys[0][0].shape[0]
    return sort_permutation_masked(
        keys, modes, jnp.arange(capacity, dtype=jnp.int64) < n
    )


def sort_permutation_masked(
    keys: Sequence[Tuple[jax.Array, Optional[jax.Array]]],
    modes: Sequence[SortMode],
    row_mask: jax.Array,
) -> jax.Array:
    """Return the permutation (capacity-sized) that sorts the rows where
    row_mask is True by the given (data, validity) keys; masked-out rows
    sort last, so the first sum(row_mask) output slots are exactly the
    sorted real rows.

    keys: list of (data array, validity or None); modes align with keys.
    """
    capacity = keys[0][0].shape[0]
    operands: List[jax.Array] = []
    pad = (~row_mask).astype(jnp.int8)
    operands.append(pad)
    for (data, validity), mode in zip(keys, modes):
        if validity is not None:
            is_null = ~validity
            # Leading flag key: 0 sorts first.  NULLS FIRST -> null rows
            # get 0; NULLS LAST -> null rows get 1.
            if mode.nulls_first:
                flag = jnp.where(is_null, jnp.int8(0), jnp.int8(1))
            else:
                flag = jnp.where(is_null, jnp.int8(1), jnp.int8(0))
            operands.append(flag)
        operands.append(_order_key(data, mode.ascending))
    iota = jnp.arange(capacity, dtype=jnp.int32)
    operands.append(iota)
    out = jax.lax.sort(tuple(operands), num_keys=len(operands) - 1, is_stable=True)
    return out[-1]


def take_along(arrays: Sequence[jax.Array], perm: jax.Array) -> List[jax.Array]:
    return [jnp.take(a, perm, axis=0) for a in arrays]

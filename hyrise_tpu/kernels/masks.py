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


def _grouped_take(arrays, idx):
    """Gather many same-length arrays at the same indices, batching
    same-dtype arrays into ONE row gather: a random access pulling a
    whole k-column row amortizes the per-access latency that bounds TPU
    gathers (see Table.take / ROOFLINE_TPU.json gather_rows_f32x8)."""
    from collections import defaultdict

    groups = defaultdict(list)
    for i, a in enumerate(arrays):
        if a is not None:
            groups[str(a.dtype)].append(i)
    out = [None] * len(arrays)
    for idxs in groups.values():
        if len(idxs) == 1:
            i = idxs[0]
            out[i] = jnp.take(arrays[i], idx, axis=0)
        else:
            mat = jnp.stack([arrays[i] for i in idxs], axis=1)
            g = jnp.take(mat, idx, axis=0)
            for j, i in enumerate(idxs):
                out[i] = g[:, j]
    return out


@partial(jax.jit, static_argnames=("out_size",))
def compact_columns(datas, valids, selection, num_rows, out_size: int):
    """Whole-table compaction in ONE dispatch: build the row mask, turn it
    into gather indices, and gather every column (+ validity) inside a
    single executable.  The per-column eager path cost ~2 dispatches per
    column per statement on the OLTP path (TPC-C stock: 18 columns).

    `valids` entries may be None (non-nullable columns) — None is an empty
    pytree so the structure just skips them."""
    cap = datas[0].shape[0]
    mask = jnp.arange(cap) < num_rows
    if selection is not None:
        mask = mask & selection
    (idx,) = jnp.nonzero(mask, size=out_size, fill_value=cap - 1)
    n_d = len(datas)
    taken = _grouped_take(list(datas) + list(valids), idx)
    out_d = tuple(taken[:n_d])
    out_v = tuple(taken[n_d:])
    return out_d, out_v


@partial(jax.jit, static_argnames=("out_size",))
def compact_columns_counted(datas, valids, selection, num_rows,
                            out_size: int):
    """compact_columns + the selected-row count in the SAME dispatch.
    Lets materialize() speculate a small output bound and learn the real
    count from the one sync it already pays — the separate count_selected
    round trip serialized every OLTP statement (count sync, THEN compact
    dispatch, THEN fetch)."""
    cap = datas[0].shape[0]
    mask = jnp.arange(cap) < num_rows
    if selection is not None:
        mask = mask & selection
    cnt = jnp.sum(mask, dtype=jnp.int64)
    (idx,) = jnp.nonzero(mask, size=out_size, fill_value=cap - 1)
    n_d = len(datas)
    taken = _grouped_take(list(datas) + list(valids), idx)
    out_d = tuple(taken[:n_d])
    out_v = tuple(taken[n_d:])
    return cnt, out_d, out_v


@jax.jit
def count_selected(selection, num_rows):
    """Fused row-mask + popcount (one dispatch for Table.valid_count)."""
    mask = (jnp.arange(selection.shape[0]) < num_rows) & selection
    return jnp.sum(mask, dtype=jnp.int64)

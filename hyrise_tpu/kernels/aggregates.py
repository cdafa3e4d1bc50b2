"""Group-by + aggregation device kernels (sort-based grouping).

TPU-native replacement for the reference's hash aggregation
(ref: operators/aggregate_hash.cpp — partition/aggregate over per-chunk key
arrays into a flat hash map).  On TPU the grouping is one fused
lexicographic sort + run-boundary detection + segment reductions
(jax.ops.segment_*), which XLA maps onto VPU-wide compare/scan/scatter
passes without pointer chasing.  Null semantics:

  - group keys: SQL GROUP BY treats NULLs as one group (null flag becomes
    part of the sort key);
  - aggregates: NULL inputs are skipped; COUNT(*) counts all rows; an
    empty/all-null group yields NULL for min/max/sum/avg/stddev.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hyrise_tpu.kernels.joins import normalize_key

# Pallas MXU grouping cap: one-hot matrices beyond this slot count stop
# paying for themselves (and stop fitting VMEM tiles)
_PALLAS_MAX_SLOTS = 1024


def _use_pallas(num_segments: int) -> bool:
    import os

    return (
        os.environ.get("HYRISE_TPU_PALLAS", "0") == "1"
        and num_segments <= _PALLAS_MAX_SLOTS
    )


@jax.jit
def group_rows(
    key_data: Tuple[jax.Array, ...],
    key_valid: Tuple[jax.Array, ...],
    n_mask: jax.Array,
):
    """Sort rows by (padding, keys...) and detect group boundaries.

    key_data: normalized int64 key arrays; key_valid: validity per key
    (all-True arrays when non-nullable); n_mask: True for real rows.

    Returns (perm, seg_ids, num_groups) where perm sorts rows with padding
    last, seg_ids assigns a dense group id per *sorted* position (padding
    rows get the last group id + are excluded by num_groups), and
    num_groups counts distinct real-row key combinations (device scalar).
    """
    capacity = key_data[0].shape[0]
    operands: List[jax.Array] = [(~n_mask).astype(jnp.int8)]
    for data, valid in zip(key_data, key_valid):
        operands.append((~valid).astype(jnp.int8))
        # sentinel in the key's NATIVE dtype: an int64-typed zero would
        # promote int32 keys and pay the emulated-64-bit sort tax
        operands.append(jnp.where(valid, data, jnp.zeros((), data.dtype)))
    iota = jnp.arange(capacity, dtype=jnp.int32)
    operands.append(iota)
    out = jax.lax.sort(tuple(operands), num_keys=len(operands) - 1, is_stable=True)
    perm = out[-1]
    sorted_cols = out[:-1]
    # Boundary where any sort key differs from the previous row.
    diff = jnp.zeros(capacity, dtype=bool).at[0].set(True)
    for col in sorted_cols:
        diff = diff | jnp.concatenate([jnp.ones(1, dtype=bool), col[1:] != col[:-1]])
    seg_ids = jnp.cumsum(diff.astype(jnp.int64)) - 1
    n_real = jnp.sum(n_mask, dtype=jnp.int64)
    # Number of groups among real rows: boundaries within [0, n_real).
    in_real = jnp.arange(capacity, dtype=jnp.int64) < n_real
    num_groups = jnp.sum(jnp.where(in_real, diff, False), dtype=jnp.int64)
    return perm, seg_ids, num_groups


@jax.jit
def group_rows_payload(
    key_data: Tuple[jax.Array, ...],
    key_valid: Tuple[jax.Array, ...],
    n_mask: jax.Array,
    payloads: Tuple[jax.Array, ...],
):
    """group_rows with payload columns riding the SAME fused sort.

    Aggregate arguments / dependent columns come out already in sorted
    order, so the reduction stage needs no permutation gathers at all —
    take(x, perm) was a full-capacity random gather (~110 ms at 8M rows
    on v5e) per array; lax.sort payload operands ride the O(n log n)
    merge network's linear data movement instead.  Payload dtypes must be
    sortable (bool is cast by the caller).

    Returns (perm, seg_ids, num_groups, sorted_real, sorted_keys,
    sorted_key_valid, sorted_payloads) — sorted_real and the sorted key
    data/validity fall out of the sort operands for free (NULL keys carry
    value 0 with validity False)."""
    capacity = key_data[0].shape[0]
    operands: List[jax.Array] = [(~n_mask).astype(jnp.int8)]
    for data, valid in zip(key_data, key_valid):
        operands.append((~valid).astype(jnp.int8))
        operands.append(jnp.where(valid, data, jnp.zeros((), data.dtype)))
    num_keys = len(operands)
    iota = jnp.arange(capacity, dtype=jnp.int32)
    operands.append(iota)
    operands.extend(payloads)
    out = jax.lax.sort(tuple(operands), num_keys=num_keys, is_stable=True)
    sorted_cols = out[:num_keys]
    perm = out[num_keys]
    sorted_payloads = tuple(out[num_keys + 1:])
    diff = jnp.zeros(capacity, dtype=bool).at[0].set(True)
    for col in sorted_cols:
        diff = diff | jnp.concatenate([jnp.ones(1, dtype=bool), col[1:] != col[:-1]])
    seg_ids = jnp.cumsum(diff.astype(jnp.int64)) - 1
    n_real = jnp.sum(n_mask, dtype=jnp.int64)
    in_real = jnp.arange(capacity, dtype=jnp.int64) < n_real
    num_groups = jnp.sum(jnp.where(in_real, diff, False), dtype=jnp.int64)
    sorted_real = sorted_cols[0] == 0
    sorted_keys = tuple(sorted_cols[2 + 2 * i] for i in range(len(key_data)))
    sorted_key_valid = tuple(
        sorted_cols[1 + 2 * i] == 0 for i in range(len(key_data))
    )
    return (perm, seg_ids, num_groups, sorted_real, sorted_keys,
            sorted_key_valid, sorted_payloads)


# jax.ops.segment_* on unsorted ids lowers to a colliding scatter that
# XLA:TPU SERIALIZES per duplicate index — measured ~650 ms for a
# 128-slot grouped sum over 2M rows (Q5's agg2).  At VERY small slot
# counts XLA's lowering stays efficient (Q1's 8-slot aggregate measured
# ~2 ms at SF1), so only the middle range reroutes to a chunked one-hot
# compare + per-segment masked reduce: pure VPU compute at S x N
# compares, exactly associative in the accumulator dtype (f64 sums stay
# sqlite-exact, unlike an MXU f32 contraction).
_SMALL_SEGMENTS_LO = 32    # <= this: XLA segment_* is already fast
_SMALL_SEGMENTS = 1024     # <= this (and > LO): chunked one-hot reduce
_CHUNK = 1 << 20           # few large scan steps, each VPU-saturating
_SMALL_MIN_ROWS = 1 << 19  # below this the colliding scatter is cheap
                           # anyway and S x N padding would dominate
                           # (OLTP's 65k-row aggregates regressed 10x
                           # when padded to the 1M chunk)


def _small(num_segments: int, n_rows: int) -> bool:
    return (_SMALL_SEGMENTS_LO < num_segments <= _SMALL_SEGMENTS
            and n_rows >= _SMALL_MIN_ROWS)


def _segment_reduce_small(vals_acc, seg_ids, num_segments: int,
                          reducer, init):
    n = vals_acc.shape[0]
    chunk = min(_CHUNK, max(1 << 14, 1 << (n - 1).bit_length()))
    pad = (-n) % chunk
    if pad:
        vals_acc = jnp.concatenate(
            [vals_acc, jnp.full(pad, init, vals_acc.dtype)])
        seg_ids = jnp.concatenate(
            [seg_ids, jnp.full(pad, num_segments, seg_ids.dtype)])
    chunks_v = vals_acc.reshape(-1, chunk)
    chunks_s = seg_ids.reshape(-1, chunk).astype(jnp.int32)
    sids = jnp.arange(num_segments, dtype=jnp.int32)

    def step(carry, cs):
        sc, vc = cs
        onehot = sc[None, :] == sids[:, None]          # (S, CHUNK)
        part = reducer(jnp.where(onehot, vc[None, :], init), axis=1)
        return reducer(jnp.stack([carry, part]), axis=0), None

    out, _ = jax.lax.scan(
        step, jnp.full(num_segments, init, vals_acc.dtype),
        (chunks_s, chunks_v),
    )
    return out


@partial(jax.jit, static_argnames=("num_segments",))
def segment_sum(values, seg_ids, valid, num_segments: int):
    acc = values.astype(_acc_dtype(values.dtype))
    acc = jnp.where(valid, acc, 0)
    if _small(num_segments, values.shape[0]):
        return _segment_reduce_small(
            acc, seg_ids, num_segments, jnp.sum,
            jnp.zeros((), acc.dtype))
    return jax.ops.segment_sum(acc, seg_ids, num_segments=num_segments)


@partial(jax.jit, static_argnames=("num_segments",))
def segment_count(seg_ids, valid, num_segments: int):
    if _small(num_segments, seg_ids.shape[0]):
        return _segment_reduce_small(
            valid.astype(jnp.int64), seg_ids, num_segments, jnp.sum,
            jnp.zeros((), jnp.int64))
    return jax.ops.segment_sum(
        valid.astype(jnp.int64), seg_ids, num_segments=num_segments
    )


@partial(jax.jit, static_argnames=("num_segments",))
def segment_min(values, seg_ids, valid, num_segments: int):
    big = _max_sentinel(values.dtype)
    vals = jnp.where(valid, values, big)
    if _small(num_segments, values.shape[0]):
        return _segment_reduce_small(vals, seg_ids, num_segments, jnp.min, big)
    return jax.ops.segment_min(vals, seg_ids, num_segments=num_segments)


@partial(jax.jit, static_argnames=("num_segments",))
def segment_max(values, seg_ids, valid, num_segments: int):
    small = _min_sentinel(values.dtype)
    vals = jnp.where(valid, values, small)
    if _small(num_segments, values.shape[0]):
        return _segment_reduce_small(vals, seg_ids, num_segments, jnp.max,
                                     small)
    return jax.ops.segment_max(vals, seg_ids, num_segments=num_segments)


@partial(jax.jit, static_argnames=("num_segments",))
def segment_sum_sq(values, seg_ids, valid, num_segments: int):
    acc = values.astype(jnp.float64)
    acc = jnp.where(valid, acc * acc, 0.0)
    if _small(num_segments, values.shape[0]):
        return _segment_reduce_small(
            acc, seg_ids, num_segments, jnp.sum, jnp.zeros((), acc.dtype))
    return jax.ops.segment_sum(acc, seg_ids, num_segments=num_segments)


# ----------------------------------------------------------- sorted segments
# When rows are already sorted by segment id (the group_rows path), segment
# reductions do NOT need scatter-adds: jax.ops.segment_sum lowers to a
# colliding scatter-add that XLA:TPU serializes per duplicate (~460 ms for
# 6M rows on v5e).  On sorted ids a segment total is the difference of the
# inclusive cumsum at the run's last row and the exclusive cumsum at its
# first row — one linear cumsum plus two provably-unique scatter-sets.
# (Analogue of the reference's cache-local immediate aggregation over
# sorted chunks, ref: operators/aggregate_sort.cpp.)


def _run_bounds(seg_sorted):
    change = seg_sorted[1:] != seg_sorted[:-1]
    start = jnp.concatenate([jnp.ones(1, bool), change])
    end = jnp.concatenate([change, jnp.ones(1, bool)])
    return start, end


def _bound_targets(seg_sorted, flags, num_segments: int):
    """Scatter targets: each flagged row -> its segment slot; everything
    else parks at a distinct out-of-bounds slot (mode=drop) so the scatter
    stays provably unique (one flagged row per segment by construction)."""
    n = seg_sorted.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    seg32 = seg_sorted.astype(jnp.int32)
    ok = flags & (seg32 >= 0) & (seg32 < num_segments)
    return jnp.where(ok, seg32, num_segments + 1 + iota)


@partial(jax.jit, static_argnames=("num_segments",))
def segment_sum_sorted(values, seg_sorted, valid, num_segments: int):
    acc = jnp.where(valid, values.astype(_acc_dtype(values.dtype)), 0)
    c = jnp.cumsum(acc)
    start, end = _run_bounds(seg_sorted)
    e = (
        jnp.zeros(num_segments, dtype=c.dtype)
        .at[_bound_targets(seg_sorted, end, num_segments)]
        .set(c, mode="drop", unique_indices=True)
    )
    b = (
        jnp.zeros(num_segments, dtype=c.dtype)
        .at[_bound_targets(seg_sorted, start, num_segments)]
        .set(c - acc, mode="drop", unique_indices=True)
    )
    return e - b


@partial(jax.jit, static_argnames=("num_segments",))
def segment_count_sorted(seg_sorted, valid, num_segments: int):
    c = jnp.cumsum(valid.astype(jnp.int32))
    start, end = _run_bounds(seg_sorted)
    e = (
        jnp.zeros(num_segments, dtype=jnp.int32)
        .at[_bound_targets(seg_sorted, end, num_segments)]
        .set(c, mode="drop", unique_indices=True)
    )
    b = (
        jnp.zeros(num_segments, dtype=jnp.int32)
        .at[_bound_targets(seg_sorted, start, num_segments)]
        .set(c - valid.astype(jnp.int32), mode="drop", unique_indices=True)
    )
    return (e - b).astype(jnp.int64)


@partial(jax.jit, static_argnames=("num_segments",))
def segment_sum_sq_sorted(values, seg_sorted, valid, num_segments: int):
    sq = values.astype(jnp.float64)
    return segment_sum_sorted(sq * sq, seg_sorted, valid, num_segments)


def _segmented_scan(op, vals, start):
    """Segmented inclusive scan: op-combine within runs, reset at starts."""

    def comb(a, b):
        f1, v1 = a
        f2, v2 = b
        return (f1 | f2, jnp.where(f2, v2, op(v1, v2)))

    _, res = jax.lax.associative_scan(comb, (start, vals))
    return res


@partial(jax.jit, static_argnames=("num_segments",))
def segment_min_sorted(values, seg_sorted, valid, num_segments: int):
    vals = jnp.where(valid, values, _max_sentinel(values.dtype))
    start, end = _run_bounds(seg_sorted)
    run = _segmented_scan(jnp.minimum, vals, start)
    return (
        jnp.full(num_segments, _max_sentinel(values.dtype), dtype=values.dtype)
        .at[_bound_targets(seg_sorted, end, num_segments)]
        .set(run, mode="drop", unique_indices=True)
    )


@partial(jax.jit, static_argnames=("num_segments",))
def segment_max_sorted(values, seg_sorted, valid, num_segments: int):
    vals = jnp.where(valid, values, _min_sentinel(values.dtype))
    start, end = _run_bounds(seg_sorted)
    run = _segmented_scan(jnp.maximum, vals, start)
    return (
        jnp.full(num_segments, _min_sentinel(values.dtype), dtype=values.dtype)
        .at[_bound_targets(seg_sorted, end, num_segments)]
        .set(run, mode="drop", unique_indices=True)
    )


def multi_segment_reduce_sorted(seg_sorted, specs, num_segments: int,
                                consecutive: bool = False):
    """Batched sorted-segment reductions sharing ONE row-stacked scatter
    per (boundary, dtype) group.

    Each reduction alone costs two ~68 ms provably-unique 6M-row scatters
    on v5e (HBM random writes are latency-bound exactly like gathers);
    SF1 Q18's five reductions + five representatives paid ~10 of them.
    All reductions scatter to the SAME run-boundary targets, so stacking
    same-dtype accumulator columns into one (n, C) row scatter amortizes
    the per-access latency the same way Table.take's row-batched gathers
    do (measured 5.2x there).

    specs: list of (kind, array) with kind:
      'sum' — array pre-masked, in its accumulator dtype;
      'min'/'max' — array pre-masked with sentinels;
      'rep' — representative (value at each segment's first row).

    `consecutive=True` promises segment ids are DENSE RANKS (0..G-1, every
    rank occupied — the group_rows path): each 'sum' then needs only the
    END scatter, its start value being the previous rank's end (a shifted
    diff).  Slots >= G receive garbage from the diff — callers already
    mask empty slots through `occupied > 0`, which stays correct because
    the garbage occupied value is <= 0 there.

    Returns a list of (num_segments,) arrays aligned with specs."""
    start, end = _run_bounds(seg_sorted)
    t_end = _bound_targets(seg_sorted, end, num_segments)
    need_start = (not consecutive) or any(k == "rep" for k, _ in specs)
    t_start = (_bound_targets(seg_sorted, start, num_segments)
               if need_start else None)
    end_req = {}
    start_req = {}
    for i, (kind, arr) in enumerate(specs):
        if kind == "sum":
            c = jnp.cumsum(arr)
            end_req[i] = c
            if not consecutive:
                start_req[i] = c - arr
        elif kind == "min":
            end_req[i] = _segmented_scan(jnp.minimum, arr, start)
        elif kind == "max":
            end_req[i] = _segmented_scan(jnp.maximum, arr, start)
        elif kind == "rep":
            start_req[i] = arr
        else:
            raise ValueError(kind)

    def scatter_group(req, targets):
        out = {}
        groups = {}
        for i, arr in req.items():
            groups.setdefault(str(arr.dtype), []).append((i, arr))
        for items in groups.values():
            if len(items) == 1:
                i, arr = items[0]
                out[i] = (
                    jnp.zeros(num_segments, arr.dtype)
                    .at[targets].set(arr, mode="drop", unique_indices=True)
                )
            else:
                mat = jnp.stack([a for _, a in items], axis=1)
                sc = (
                    jnp.zeros((num_segments, mat.shape[1]), mat.dtype)
                    .at[targets].set(mat, mode="drop", unique_indices=True)
                )
                for j, (i, _) in enumerate(items):
                    out[i] = sc[:, j]
        return out

    e = scatter_group(end_req, t_end)
    b = scatter_group(start_req, t_start) if start_req else {}
    results = []
    for i, (kind, arr) in enumerate(specs):
        if kind == "sum":
            if consecutive:
                ei = e[i]
                results.append(
                    ei - jnp.concatenate([jnp.zeros(1, ei.dtype), ei[:-1]])
                )
            else:
                results.append(e[i] - b[i])
        elif kind in ("min", "max"):
            results.append(e[i])
        else:
            results.append(b[i])
    return results


@partial(jax.jit, static_argnames=("num_segments",))
def segment_rep_sorted(values, seg_sorted, num_segments: int):
    """Representative (run-start) value per segment: one provably-unique
    scatter replaces the first_pos + double-gather chain (take(perm, ...)
    then take(data, rep_rows) were full-capacity random gathers)."""
    start, _ = _run_bounds(seg_sorted)
    return (
        jnp.zeros(num_segments, dtype=values.dtype)
        .at[_bound_targets(seg_sorted, start, num_segments)]
        .set(values, mode="drop", unique_indices=True)
    )


@partial(jax.jit, static_argnames=("num_segments",))
def segment_first_sorted(seg_sorted, num_segments: int):
    """First sorted position of each segment (0 for empty slots)."""
    start, _ = _run_bounds(seg_sorted)
    iota = jnp.arange(seg_sorted.shape[0], dtype=jnp.int64)
    return (
        jnp.zeros(num_segments, dtype=jnp.int64)
        .at[_bound_targets(seg_sorted, start, num_segments)]
        .set(iota, mode="drop", unique_indices=True)
    )


def _acc_dtype(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.float64
    return jnp.int64


def _max_sentinel(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.inf, dtype=dtype)
    return jnp.array(jnp.iinfo(dtype).max, dtype=dtype)


def _min_sentinel(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(-jnp.inf, dtype=dtype)
    return jnp.array(jnp.iinfo(dtype).min, dtype=dtype)

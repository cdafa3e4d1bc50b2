"""Distributed shuffle + join/aggregate primitives over a device mesh.

The TPU-native replacement for the reference's radix partitioning step in
JoinHash (ref: join_hash_steps.hpp:522-580 partitions into cache-sized
clusters; here rows partition across *chips* and the "partition" movement
is one `all_to_all` over ICI).  All shapes stay static: each (src, dst)
bucket has a fixed per-shard capacity, rows are routed into their bucket
slot by a local sort, and overflow is detected via counts (callers retry
with a bigger capacity; the host picks capacities from table sizes with
headroom).

Everything in this module runs INSIDE shard_map — inputs are the per-shard
local blocks (rows_per_shard,) and the mesh axis is `SHARD_AXIS`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from hyrise_tpu.parallel.mesh import SHARD_AXIS

I64_MAX = jnp.iinfo(jnp.int64).max


def dest_of_key(keys: jax.Array, n_shards: int) -> jax.Array:
    """Destination shard for a join/group key (multiplicative hashing so
    skewed low bits still spread; ref: join_hash hash-partitioning)."""
    if jnp.issubdtype(keys.dtype, jnp.floating):
        keys = keys.astype(jnp.int64)  # equal values -> equal shard
    h = keys.astype(jnp.uint64) * jnp.uint64(0x9E3779B97F4A7C15)
    return ((h >> jnp.uint64(33)) % jnp.uint64(n_shards)).astype(jnp.int32)


def route_to_buckets(keys: jax.Array, valid: jax.Array, payload: Tuple[jax.Array, ...],
                     n_shards: int, bucket_cap: int):
    """Pack local rows into (n_shards, bucket_cap) send buffers.

    Returns (bucket_keys, bucket_valid, bucket_payload, overflow) where
    overflow counts rows that did not fit their bucket (host checks)."""
    n = keys.shape[0]
    dest = jnp.where(valid, dest_of_key(keys, n_shards), n_shards)
    # stable sort by destination groups rows per bucket
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_dest, perm = jax.lax.sort((dest, iota), num_keys=1, is_stable=True)
    # slot within bucket = position - first position of that dest
    first_of_dest = jnp.searchsorted(
        sorted_dest, jnp.arange(n_shards + 1, dtype=sorted_dest.dtype), side="left"
    )
    pos = jnp.arange(n, dtype=jnp.int32)
    slot = pos - jnp.take(first_of_dest, jnp.clip(sorted_dest, 0, n_shards))
    in_cap = (slot < bucket_cap) & (sorted_dest < n_shards)
    counts = jnp.take(first_of_dest, jnp.arange(1, n_shards + 1)) - jnp.take(
        first_of_dest, jnp.arange(n_shards)
    )
    overflow = jnp.sum(jnp.maximum(counts - bucket_cap, 0))

    # rows that don't fit (or are invalid) scatter OUT OF BOUNDS at
    # distinct offsets (mode=drop): indices stay provably unique, which
    # keeps the scatter parallel on TPU (XLA serializes otherwise)
    parking = n_shards * bucket_cap
    flat_idx = jnp.where(
        in_cap,
        sorted_dest * bucket_cap + slot,
        parking + pos,
    )

    def scatter(vals, fill):
        src = jnp.take(vals, perm)
        out = jnp.full((parking,), fill, dtype=vals.dtype)
        out = out.at[flat_idx].set(src, mode="drop", unique_indices=True)
        return out.reshape(n_shards, bucket_cap)

    bucket_keys = scatter(keys, 0)
    bucket_valid = (
        jnp.zeros((parking,), dtype=bool)
        .at[flat_idx]
        .set(jnp.take(valid, perm), mode="drop", unique_indices=True)
        .reshape(n_shards, bucket_cap)
    )
    bucket_payload = tuple(scatter(pv, 0) for pv in payload)
    return bucket_keys, bucket_valid, bucket_payload, overflow


def exchange(bucket_array: jax.Array) -> jax.Array:
    """all_to_all over the shard axis: (n_shards, cap, ...) send buckets ->
    (n_shards, cap, ...) receive buckets (bucket i now holds rows sent by
    shard i)."""
    return jax.lax.all_to_all(
        bucket_array, SHARD_AXIS, split_axis=0, concat_axis=0, tiled=False
    )


def shuffle_rows(keys, valid, payload, n_shards: int, bucket_cap: int):
    """Full shuffle: route + exchange + flatten.  Output rows live on the
    shard owning hash(key); returns (keys, valid, payload, overflow)."""
    bk, bv, bp, overflow = route_to_buckets(keys, valid, payload, n_shards,
                                            bucket_cap)
    rk = exchange(bk).reshape(-1)
    rv = exchange(bv).reshape(-1)
    rp = tuple(exchange(p).reshape(-1) for p in bp)
    return rk, rv, rp, overflow


# ------------------------------------------------------------ bloom filter

BLOOM_LOG2 = 20  # 2^20 bits, matching the reference (join_hash_steps.hpp:252)


def _bloom_hash(keys: jax.Array) -> jax.Array:
    h = keys.astype(jnp.uint64) * jnp.uint64(0xBF58476D1CE4E5B9)
    return (h >> jnp.uint64(64 - BLOOM_LOG2)).astype(jnp.int32)


def bloom_build(keys: jax.Array, valid: jax.Array) -> jax.Array:
    """Global build-side bloom filter: per-shard bit sets OR-combined over
    the mesh (psum of int8 + threshold — 1 MiB over ICI).  Bit indices are
    deduplicated by a sort so the scatter stays provably unique (XLA:TPU
    serializes scatters it cannot prove unique)."""
    n = keys.shape[0]
    bits = jnp.where(valid, _bloom_hash(keys), jnp.int32(1 << BLOOM_LOG2))
    sorted_bits = jnp.sort(bits)
    first = jnp.concatenate(
        [jnp.ones(1, bool), sorted_bits[1:] != sorted_bits[:-1]])
    pos = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.where(first, sorted_bits, jnp.int32(1 << BLOOM_LOG2) + pos)
    local = jnp.zeros(1 << BLOOM_LOG2, jnp.int8).at[idx].set(
        1, mode="drop", unique_indices=True)
    return jax.lax.psum(local, SHARD_AXIS) > 0


def bloom_probe(bloom: jax.Array, keys: jax.Array) -> jax.Array:
    """True for keys that MAY be in the build side (no false negatives);
    probe rows failing it skip the shuffle entirely (the semi-join
    pruning BASELINE.md names for the SSB/shuffle path)."""
    return jnp.take(bloom, _bloom_hash(keys))


# ----------------------------------------------------------- local kernels
# (shard-local join/aggregate used after a shuffle; mirror kernels/joins.py
# but usable inside shard_map)


def local_equi_join(build_keys, build_valid, probe_keys, probe_valid,
                    out_cap: int):
    """Shard-local sorted join; returns (probe_idx, build_idx, pair_valid,
    total_pairs) — total_pairs may exceed out_cap (caller detects overflow
    and retries with a bigger capacity)."""
    skeys = jnp.where(build_valid, build_keys, I64_MAX)
    iota = jnp.arange(build_keys.shape[0], dtype=jnp.int32)
    sorted_keys, perm = jax.lax.sort((skeys, iota), num_keys=1, is_stable=True)
    n_valid = jnp.sum(build_valid, dtype=jnp.int64)
    left = jnp.minimum(
        jnp.searchsorted(sorted_keys, probe_keys, side="left").astype(jnp.int64),
        n_valid,
    )
    right = jnp.minimum(
        jnp.searchsorted(sorted_keys, probe_keys, side="right").astype(jnp.int64),
        n_valid,
    )
    counts = jnp.where(probe_valid, right - left, 0)
    cum = jnp.cumsum(counts)
    total = cum[-1]
    starts = (cum - counts).astype(jnp.int32)
    out_j = jnp.arange(out_cap, dtype=jnp.int64)
    # run expansion via scatter + running max (searchsorted over the
    # HBM-resident prefix sum ran ~23 dependent random-gather rounds;
    # see kernels/joins.py::expand_matches)
    n_probe = counts.shape[0]
    park = out_cap + 1 + jnp.arange(n_probe, dtype=jnp.int32)
    pos = jnp.where(counts > 0, starts, park)
    marks = (
        jnp.full(out_cap + 1, -1, dtype=jnp.int32)
        .at[pos].set(jnp.arange(n_probe, dtype=jnp.int32),
                     mode="drop", unique_indices=True)
    )[:out_cap]
    probe_idx = jnp.maximum(jax.lax.cummax(marks), 0)
    k = out_j - jnp.take(starts, probe_idx).astype(jnp.int64)
    build_pos = jnp.clip(jnp.take(left, probe_idx) + k, 0, perm.shape[0] - 1)
    build_idx = jnp.take(perm, build_pos)
    pair_valid = out_j < total
    return probe_idx, build_idx, pair_valid, total


def dense_group_sum(slot_ids, values, valid, num_slots: int,
                    reduce_over_mesh: bool = True):
    """Aggregate into dense slots (small key domains, e.g. dictionary codes)
    then psum across shards — the distributed Q1 pattern."""
    acc = jnp.where(valid, values, 0).astype(
        jnp.float64 if jnp.issubdtype(values.dtype, jnp.floating) else jnp.int64
    )
    out = jax.ops.segment_sum(acc, jnp.where(valid, slot_ids, num_slots),
                              num_segments=num_slots)
    if reduce_over_mesh:
        out = jax.lax.psum(out, SHARD_AXIS)
    return out


def dense_group_count(slot_ids, valid, num_slots: int,
                      reduce_over_mesh: bool = True):
    out = jax.ops.segment_sum(
        valid.astype(jnp.int64), jnp.where(valid, slot_ids, num_slots),
        num_segments=num_slots,
    )
    if reduce_over_mesh:
        out = jax.lax.psum(out, SHARD_AXIS)
    return out

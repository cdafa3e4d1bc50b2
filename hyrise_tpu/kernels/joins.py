"""Equi-join device kernels: sort + binary-search + static-bound expansion.

TPU-native replacement for the reference's radix-partitioned hash join
(ref: operators/join_hash.cpp, join_hash/join_hash_steps.hpp).  Instead of
pointer-chasing hash tables, the build side is sorted once (XLA fused sort)
and probes run vectorized binary searches; duplicate expansion uses the
count -> bucket -> expand pattern so every shape stays XLA-static:

  1. count:  per-probe match counts via searchsorted left/right  (1 pass)
  2. host sync: total -> pick a power-of-two output capacity
  3. expand: each output slot finds its (probe, duplicate) pair via one
     searchsorted over the inclusive count prefix sum            (1 pass)

Null keys and padding rows are excluded by giving them a +inf sentinel slot
past `n_valid` and clamping searchsorted results.  Secondary (non-equi or
additional equi) join predicates are evaluated on the expanded pairs
(ref: multi_predicate_join_evaluator.*).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_I64_MAX = jnp.iinfo(jnp.int64).max


def normalize_key(data: jax.Array) -> jax.Array:
    """Map a column to an order-preserving sort/join key in its NATIVE
    width: int32 keys stay int32 (TPU emulates 64-bit integers as pairs —
    a 2x sort/search tax worth avoiding), floats stay floats (no 64-bit
    bitcasts, which XLA:TPU cannot lower).  Callers comparing keys from
    two sides promote to a common dtype via `common_key_dtype`."""
    if jnp.issubdtype(data.dtype, jnp.floating):
        return data
    if data.dtype == jnp.bool_:
        return data.astype(jnp.int32)
    return data


def common_key_dtype(a: jax.Array, b: jax.Array):
    return jnp.promote_types(a.dtype, b.dtype)


def key_sentinel_max(dtype):
    """Sorts-after-everything sentinel for a key dtype."""
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.inf, dtype=dtype)
    return jnp.array(jnp.iinfo(dtype).max, dtype=dtype)


def pack_keys(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """Pack two int32-range keys into one int64 (for 2-column equi joins)."""
    return (hi.astype(jnp.int64) << 32) | (lo.astype(jnp.int64) & 0xFFFFFFFF)


@jax.jit
def build_sorted(keys: jax.Array, valid: jax.Array):
    """Sort the build side: invalid (null-key or padding) rows get the
    max sentinel and sort last.  Returns (sorted_keys, perm, n_valid)."""
    skeys = jnp.where(valid, keys, key_sentinel_max(keys.dtype))
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    sorted_keys, perm = jax.lax.sort((skeys, iota), num_keys=1, is_stable=True)
    n_valid = jnp.sum(valid, dtype=jnp.int64)
    return sorted_keys, perm, n_valid


@jax.jit
def probe_counts(
    sorted_keys: jax.Array,
    n_build_valid: jax.Array,
    probe_keys: jax.Array,
    probe_valid: jax.Array,
):
    """Per-probe-row match counts + match ranges.  Returns
    (left, counts) where left is the first matching slot in sorted order."""
    left = jnp.searchsorted(sorted_keys, probe_keys, side="left").astype(jnp.int64)
    right = jnp.searchsorted(sorted_keys, probe_keys, side="right").astype(jnp.int64)
    left = jnp.minimum(left, n_build_valid)
    right = jnp.minimum(right, n_build_valid)
    counts = jnp.where(probe_valid, right - left, 0)
    return left, counts


@partial(jax.jit, static_argnames=("out_capacity",))
def expand_matches(
    left: jax.Array,
    counts: jax.Array,
    build_perm: jax.Array,
    out_capacity: int,
):
    """Expand (probe, duplicate) pairs into padded index vectors.

    Returns (probe_idx, build_idx, valid) each of length out_capacity.

    probe_idx[j] is the p with starts[p] <= j < cum[p].  Because the
    searched values ARE the positions 0..out_capacity-1, this is a run
    expansion, not a search: scatter p at starts[p] (strictly increasing
    over count>0 probes, so provably unique) and forward-fill with a
    running max.  The searchsorted formulation lowered to ~23 dependent
    random-gather rounds over the HBM-resident prefix sum and took 6.5 s
    for an 8M-row expansion on v5e; the scatter+cummax runs two linear
    passes."""
    cum = jnp.cumsum(counts)               # inclusive prefix sum
    total = cum[-1] if counts.shape[0] else jnp.int64(0)
    starts = (cum - counts).astype(jnp.int32)  # exclusive prefix sum
    n_probe = counts.shape[0]
    # count==0 probes park at distinct out-of-bounds slots (mode=drop);
    # unique_indices keeps the scatter parallel on TPU
    park = out_capacity + 1 + jnp.arange(n_probe, dtype=jnp.int32)
    pos = jnp.where(counts > 0, starts, park)
    marks = (
        jnp.full(out_capacity + 1, -1, dtype=jnp.int32)
        .at[pos].set(jnp.arange(n_probe, dtype=jnp.int32),
                     mode="drop", unique_indices=True)
    )[:out_capacity]
    probe_idx = jnp.maximum(jax.lax.cummax(marks), 0)
    out_j = jnp.arange(out_capacity, dtype=jnp.int64)
    k = out_j - jnp.take(starts, probe_idx).astype(jnp.int64)
    build_pos = jnp.take(left, probe_idx) + k
    build_pos = jnp.clip(build_pos, 0, build_perm.shape[0] - 1)
    build_idx = jnp.take(build_perm, build_pos)
    valid = out_j < total
    return probe_idx.astype(jnp.int64), build_idx.astype(jnp.int64), valid


@jax.jit
def total_matches(counts: jax.Array) -> jax.Array:
    return jnp.sum(counts, dtype=jnp.int64)


@jax.jit
def merge_probe(bk, bv: jax.Array, pk, pv: jax.Array):
    """Build + probe in ONE merged sort (no searchsorted).

    searchsorted lowers to log2(n_build) DEPENDENT random-gather rounds
    over the HBM-resident build side — ~220 ms per search for 600k-into-
    600k on v5e, and probe_counts needs two.  Sorting the concatenated
    (build ++ probe) keys once and counting builds with cumsum gives the
    same (left, counts) in one O(n log n) fused sort + linear passes.

    Equal keys order builds before probes (side flag is the tie-break sort
    key), so at a probe row's sorted position the inclusive build-count
    cumsum IS its `right` bound, and the exclusive build count at the
    run's first row IS its `left` bound (ref semantics:
    join_hash_steps.hpp probe ranges).

    `bk`/`pk` may be TUPLES of aligned key columns: multi-column equi keys
    sort as separate int32 operands instead of packing into one int64
    (TPU emulates 64-bit integers as pairs — a 2x sort tax; ref composite
    keys: join_hash_steps.hpp pack into one uint64).

    Returns (build_perm, left, counts): build_perm[r] = original build row
    at build-key rank r (valid keys first, key order); left[p] = rank of
    the first matching build row for probe p; counts[p] = matches.
    """
    if not isinstance(bk, (tuple, list)):
        bk, pk = (bk,), (pk,)
    n_b, n_p = bk[0].shape[0], pk[0].shape[0]
    n = n_b + n_p
    keys = []
    for bki, pki in zip(bk, pk):
        dt = common_key_dtype(bki, pki)
        sent = key_sentinel_max(dt)
        keys.append(jnp.concatenate([
            jnp.where(bv, bki.astype(dt), sent),
            jnp.where(pv, pki.astype(dt), sent),
        ]))
    side = jnp.concatenate([
        jnp.zeros(n_b, dtype=jnp.int8), jnp.ones(n_p, dtype=jnp.int8)
    ])
    iota = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort(tuple(keys) + (side, iota), num_keys=len(keys) + 1,
                       is_stable=True)
    skeys_all = out[:len(keys)]
    sside = out[len(keys)]
    sorig = out[len(keys) + 1]
    is_build = sside == 0
    # count only VALID builds (invalid ones carry the sentinel key; a valid
    # probe key equal to the sentinel must not match them).  Row counts fit
    # int32 — int64 is emulated on TPU at ~2x cost.
    countable = jnp.take(jnp.concatenate([bv, jnp.zeros(n_p, bool)]), sorig)
    bcum = jnp.cumsum(countable.astype(jnp.int32))          # inclusive
    run_start = jnp.zeros(n, dtype=bool).at[0].set(True)
    for sk in skeys_all:
        run_start = run_start | jnp.concatenate(
            [jnp.ones(1, bool), sk[1:] != sk[:-1]]
        )
    excl = bcum - countable.astype(jnp.int32)               # builds < pos
    # broadcast the run-start exclusive count to the whole run: excl at
    # run starts is non-decreasing, so a running max over masked marks
    # forward-fills without any gather
    left_run = jax.lax.cummax(jnp.where(run_start, excl, jnp.int32(-1)))
    counts_sorted = jnp.where(is_build, 0, bcum - left_run)
    # scatter probe results back to original probe positions (parked
    # out-of-bounds targets keep every index provably unique)
    park = n_p + 1 + jnp.arange(n, dtype=jnp.int32)
    ptarget = jnp.where(is_build, park, sorig - n_b)
    left = (
        jnp.zeros(n_p, dtype=jnp.int32)
        .at[ptarget].set(left_run, mode="drop", unique_indices=True)
    )
    counts = (
        jnp.zeros(n_p, dtype=jnp.int32)
        .at[ptarget].set(counts_sorted, mode="drop", unique_indices=True)
    )
    counts = jnp.where(pv, counts, 0)
    # build_perm: original build row per build-key rank (ALL builds ranked;
    # invalid ones sort last, past every reachable left+k < n_valid)
    brank = jnp.cumsum(is_build.astype(jnp.int32)) - 1
    btarget = jnp.where(is_build, brank, n_b + 1 + jnp.arange(n, dtype=jnp.int32))
    build_perm = (
        jnp.zeros(n_b, dtype=jnp.int32)
        .at[btarget].set(sorig, mode="drop", unique_indices=True)
    )
    return build_perm, left.astype(jnp.int64), counts.astype(jnp.int64)


# -------------------------------------------------- dense direct addressing
# For unique int build keys with a known small [lo, hi] range (PK columns:
# orderkey, custkey, partkey ...), the build becomes ONE scatter and each
# probe ONE gather — replacing the O(n log n) device sort and the ~20
# dependent gather rounds of searchsorted.  This is the TPU analogue of the
# reference's hash join on a perfect hash (join_hash.cpp) and mirrors the
# dense-slot aggregation fast path.


@partial(jax.jit, static_argnames=("lo", "dsize"))
def dense_build(bk: jax.Array, bv: jax.Array, lo: int, dsize: int):
    """slot[key - lo] = build row index (or -1).  Out-of-range / invalid
    rows park at slot dsize.  Caller guarantees unique in-range keys
    (declared soft PK/UCC + fresh statistics bounds)."""
    idx = bk.astype(jnp.int64) - lo
    ok = bv & (idx >= 0) & (idx < dsize)
    # parked rows scatter OUT OF BOUNDS (mode=drop) at distinct offsets so
    # every index is provably unique — without the hint XLA:TPU serializes
    # the scatter (measured 38x slower on v5e)
    park = dsize + 1 + jnp.arange(bk.shape[0], dtype=jnp.int64)
    target = jnp.where(ok, idx, park)
    slot = jnp.full(dsize + 1, -1, dtype=jnp.int32)
    return slot.at[target].set(
        jnp.arange(bk.shape[0], dtype=jnp.int32),
        mode="drop", unique_indices=True,
    )


@partial(jax.jit, static_argnames=("lo", "dsize"))
def dense_probe(slot: jax.Array, pk: jax.Array, pv: jax.Array,
                lo: int, dsize: int):
    """-> (left_pos, counts) with counts in {0,1}; left_pos indexes `slot`
    so the shared expansion kernels can treat slot as build_perm."""
    idx = pk.astype(jnp.int64) - lo
    pin = pv & (idx >= 0) & (idx < dsize)
    pslot = jnp.where(pin, idx, dsize)
    brow = jnp.take(slot, pslot.astype(jnp.int32))
    got = pin & (brow >= 0)
    return pslot, got.astype(jnp.int64)


@partial(jax.jit, static_argnames=("out_capacity",))
def expand_unique(left: jax.Array, counts: jax.Array, build_perm: jax.Array,
                  out_capacity: int):
    """Expansion for counts ∈ {0,1}: a single compaction scatter replaces
    expand_matches' searchsorted over the prefix sum."""
    brow = jnp.take(
        build_perm, jnp.clip(left, 0, build_perm.shape[0] - 1).astype(jnp.int32)
    )
    cum = jnp.cumsum(counts)
    total = cum[-1] if counts.shape[0] else jnp.int64(0)
    starts = cum - counts
    # matched rows land at unique compaction slots; the rest park at
    # distinct out-of-bounds offsets (dropped) so the scatter is provably
    # unique and stays parallel on TPU
    park = out_capacity + 1 + jnp.arange(counts.shape[0], dtype=jnp.int64)
    pos = jnp.where(counts > 0, starts, park)
    probe_idx = (
        jnp.zeros(out_capacity + 1, dtype=jnp.int64)
        .at[pos].set(jnp.arange(counts.shape[0], dtype=jnp.int64),
                     mode="drop", unique_indices=True)
    )[:out_capacity]
    build_idx = jnp.take(brow, probe_idx).astype(jnp.int64)
    valid = jnp.arange(out_capacity, dtype=jnp.int64) < total
    return probe_idx, build_idx, valid


@jax.jit
def contains(sorted_keys: jax.Array, n_valid: jax.Array, keys: jax.Array,
             keys_valid: jax.Array) -> jax.Array:
    """Membership test (semi/anti joins, IN-subqueries): True where `keys`
    appears among the first n_valid sorted build keys."""
    left = jnp.searchsorted(sorted_keys, keys, side="left").astype(jnp.int64)
    right = jnp.searchsorted(sorted_keys, keys, side="right").astype(jnp.int64)
    left = jnp.minimum(left, n_valid)
    right = jnp.minimum(right, n_valid)
    return keys_valid & (right > left)

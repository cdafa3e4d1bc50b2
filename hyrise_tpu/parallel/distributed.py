"""End-to-end distributed query steps compiled over a mesh.

The flagship multi-chip pipeline (the analogue of a "training step"): a
hash-partitioned fact table is filtered locally, shuffled by join key over
ICI (all_to_all), joined shard-locally against the co-shuffled build side,
and aggregated with a psum tree — one jitted computation, shapes static.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from hyrise_tpu.parallel.mesh import QueryMesh, SHARD_AXIS
from hyrise_tpu.parallel import shuffle as shf


def make_distributed_join_agg_step(qmesh: QueryMesh, bucket_cap: int,
                                   join_out_cap: int, num_groups: int):
    """Build a jitted distributed step:

        probe side: (keys, valid, group_slot, value)   row-sharded
        build side: (keys, valid)                      row-sharded

        filter is assumed already applied in `valid`; the step shuffles
        BOTH sides by key, joins shard-locally, and returns per-group
        (sum, count) replicated on every device.
    """
    n = qmesh.n

    def local_step(p_keys, p_valid, p_slot, p_val, b_keys, b_valid):
        # shard_map feeds (1, rows) blocks for a (shards, rows) input
        p_keys, p_valid, p_slot, p_val, b_keys, b_valid = (
            x.reshape(-1) for x in (p_keys, p_valid, p_slot, p_val, b_keys, b_valid)
        )
        # ---- shuffle probe side by key
        pk, pv, (ps, pval), p_over = shf.shuffle_rows(
            p_keys, p_valid, (p_slot, p_val), n, bucket_cap
        )
        # ---- shuffle build side by key
        bk, bv, _, b_over = shf.shuffle_rows(b_keys, b_valid, (), n, bucket_cap)
        # ---- shard-local join
        probe_idx, build_idx, pair_valid, _ = shf.local_equi_join(
            bk, bv, pk, pv, join_out_cap
        )
        # ---- aggregate joined rows into dense group slots + psum
        slot = jnp.take(ps, probe_idx)
        val = jnp.take(pval, probe_idx)
        sums = shf.dense_group_sum(slot, val, pair_valid, num_groups)
        counts = shf.dense_group_count(slot, pair_valid, num_groups)
        overflow = jax.lax.psum(p_over + b_over, SHARD_AXIS)
        return sums.reshape(1, -1), counts.reshape(1, -1), overflow.reshape(1)

    sharded = shard_map(
        local_step,
        mesh=qmesh.mesh,
        in_specs=(
            P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(SHARD_AXIS, None),
            P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(SHARD_AXIS, None),
        ),
        out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(SHARD_AXIS)),
        check_vma=False,
    )

    @jax.jit
    def step(p_keys, p_valid, p_slot, p_val, b_keys, b_valid):
        sums, counts, overflow = sharded(
            p_keys, p_valid, p_slot, p_val, b_keys, b_valid
        )
        # every shard computed the same psum result; take shard 0's copy
        return sums[0], counts[0], overflow[0]

    return step


def make_distributed_scan_agg_step(qmesh: QueryMesh, num_groups: int):
    """Distributed Q1/Q6 pattern: local filter mask + dense grouped
    aggregation + psum (no shuffle needed — aggregation commutes)."""

    def local_step(mask, slot, value):
        mask, slot, value = (x.reshape(-1) for x in (mask, slot, value))
        sums = shf.dense_group_sum(slot, value, mask, num_groups)
        counts = shf.dense_group_count(slot, mask, num_groups)
        return sums.reshape(1, -1), counts.reshape(1, -1)

    sharded = shard_map(
        local_step,
        mesh=qmesh.mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(SHARD_AXIS, None)),
        out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None)),
        check_vma=False,
    )

    @jax.jit
    def step(mask, slot, value):
        sums, counts = sharded(mask, slot, value)
        return sums[0], counts[0]

    return step

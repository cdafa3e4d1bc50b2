"""Distributed query execution over a ShardedTable mesh.

Bridges the single-chip engine's expression machinery into shard_map:
each shard rebuilds a local Table view over its block and runs the SAME
vectorized ExpressionEvaluator, so filters/projections need no separate
distributed implementation.  Aggregations reduce with psum over dense
group slots; joins co-shuffle both sides by key over ICI (all_to_all)
and join shard-locally (SURVEY §2.17's TPU-native communication layer).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from hyrise_tpu.expression import ast
from hyrise_tpu.expression.evaluator import ExpressionEvaluator
from hyrise_tpu.parallel import shuffle as shf
from hyrise_tpu.parallel.mesh import QueryMesh, SHARD_AXIS, ShardedTable
from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import AggregateFunction, DataType


def _local_table(st: ShardedTable, blocks: Sequence[jax.Array],
                 valids: Sequence[Optional[jax.Array]],
                 row_valid: jax.Array) -> Table:
    """Rebuild a shard-local Table from traced shard blocks."""
    cols = []
    for sc, data, valid in zip(st.columns, blocks, valids):
        dt = _dtype_of(sc)
        cols.append(Column(dt, data, valid, sc.dictionary, True))
    t = Table(st.column_names, cols, row_valid.shape[0], selection=row_valid)
    return t


def _dtype_of(sc) -> DataType:
    if sc.dictionary is not None:
        return DataType.STRING
    kind = sc.data.dtype
    if kind == jnp.int32:
        return DataType.INT
    if kind == jnp.int64:
        return DataType.LONG
    if kind == jnp.float32:
        return DataType.FLOAT
    return DataType.DOUBLE


def _columns_resolver(st: ShardedTable):
    refs = {}
    for i, name in enumerate(st.column_names):
        refs[name] = i
    return refs


def _flatten_sharded(st: ShardedTable):
    datas = [c.data for c in st.columns]
    valids = [c.validity for c in st.columns]
    return datas, valids, st.row_valid


def _make_name_map(st: ShardedTable, exprs: Dict[str, ast.ColumnRef]):
    return {exprs[name].key(): i for i, name in enumerate(st.column_names)
            if name in exprs}


def column_refs(st: ShardedTable) -> Dict[str, ast.ColumnRef]:
    out = {}
    for name, sc in zip(st.column_names, st.columns):
        out[name] = ast.ColumnRef(name, _dtype_of(sc), sc.validity is not None)
    return out


def dense_slots(ev: ExpressionEvaluator, group_exprs, domains) -> jax.Array:
    """Dense slot id per row; rows with a NULL group key map to the
    out-of-range sentinel (the product of domains) so segment ops DROP
    them instead of aliasing the last real group."""
    slot = jnp.zeros(ev.capacity, dtype=jnp.int32)
    null_any = jnp.zeros(ev.capacity, dtype=bool)
    total = 1
    for e, (offset, domain) in zip(group_exprs, domains):
        r = ev.evaluate(e)
        code = r.data.astype(jnp.int32) - offset
        if r.validity is not None:
            null_any = null_any | ~r.validity
        slot = slot * domain + jnp.clip(code, 0, domain - 1)
        total *= domain
    return jnp.where(null_any, jnp.int32(total), slot)


def distributed_scan_aggregate(
    st: ShardedTable,
    refs: Dict[str, ast.ColumnRef],
    predicate: Optional[ast.Expression],
    group_exprs: Sequence[ast.Expression],
    group_domains: Sequence[Tuple[int, int]],  # (offset, size) per key
    agg_specs: Sequence[Tuple[AggregateFunction, Optional[ast.Expression]]],
):
    """Distributed filter+group+aggregate (the Q1/Q6 pattern): shard-local
    expression evaluation + dense-slot partials + one psum tree.
    Returns host numpy arrays: (slot_keys..., agg results..., counts)."""
    qmesh = st.mesh
    n_slots = 1
    for _, size in group_domains:
        n_slots *= size
    n_slots = max(n_slots, 1)
    cmap = _make_name_map(st, refs)

    def local(blocks, valids, row_valid):
        blocks = [b.reshape(-1) for b in blocks]
        valids = [v.reshape(-1) if v is not None else None for v in valids]
        rv = row_valid.reshape(-1)
        t = _local_table(st, blocks, valids, rv)
        ev = ExpressionEvaluator(t, cmap)
        mask = rv
        if predicate is not None:
            mask = mask & ev.selection_mask(predicate)
        slot = (
            dense_slots(ev, group_exprs, group_domains)
            if group_exprs else jnp.zeros(t.capacity, dtype=jnp.int32)
        )
        seg = jnp.where(mask, slot, n_slots)
        outs = []
        occupied = jax.lax.psum(
            jax.ops.segment_sum(mask.astype(jnp.int64), seg,
                                num_segments=n_slots),
            SHARD_AXIS,
        )
        outs.append(occupied)
        for fn, arg in agg_specs:
            if arg is None:
                outs.append(occupied)  # COUNT(*)
                continue
            r = ev.evaluate(arg)
            valid = mask if r.validity is None else (mask & r.validity)
            vals = r.data
            acc_dt = (
                jnp.float64 if jnp.issubdtype(vals.dtype, jnp.floating)
                else jnp.int64
            )
            seg_v = jnp.where(valid, seg, n_slots)
            if fn == AggregateFunction.SUM:
                part = jax.ops.segment_sum(vals.astype(acc_dt), seg_v,
                                           num_segments=n_slots)
                outs.append(jax.lax.psum(part, SHARD_AXIS))
            elif fn == AggregateFunction.COUNT:
                part = jax.ops.segment_sum(valid.astype(jnp.int64), seg_v,
                                           num_segments=n_slots)
                outs.append(jax.lax.psum(part, SHARD_AXIS))
            elif fn == AggregateFunction.AVG:
                s = jax.lax.psum(
                    jax.ops.segment_sum(vals.astype(jnp.float64), seg_v,
                                        num_segments=n_slots), SHARD_AXIS)
                c = jax.lax.psum(
                    jax.ops.segment_sum(valid.astype(jnp.int64), seg_v,
                                        num_segments=n_slots), SHARD_AXIS)
                outs.append(s / jnp.maximum(c, 1))
            elif fn == AggregateFunction.MIN:
                big = (jnp.inf if jnp.issubdtype(vals.dtype, jnp.floating)
                       else jnp.iinfo(vals.dtype).max)
                part = jax.ops.segment_min(
                    jnp.where(valid, vals, big), seg_v, num_segments=n_slots)
                outs.append(jax.lax.pmin(part, SHARD_AXIS))
            elif fn == AggregateFunction.MAX:
                small = (-jnp.inf if jnp.issubdtype(vals.dtype, jnp.floating)
                         else jnp.iinfo(vals.dtype).min)
                part = jax.ops.segment_max(
                    jnp.where(valid, vals, small), seg_v, num_segments=n_slots)
                outs.append(jax.lax.pmax(part, SHARD_AXIS))
            else:
                raise NotImplementedError(fn)
        return [o.reshape(1, -1) for o in outs]

    sharded = shard_map(
        local,
        mesh=qmesh.mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(SHARD_AXIS, None)),
        out_specs=P(SHARD_AXIS, None),
        check_vma=False,
    )
    datas, valids, row_valid = _flatten_sharded(st)

    @jax.jit
    def run(datas, valids, row_valid):
        outs = sharded(datas, valids, row_valid)
        return [o[0] for o in outs]

    outs = run(datas, valids, row_valid)
    occupied = np.asarray(outs[0])
    results = [np.asarray(o) for o in outs[1:]]
    return occupied, results


def distributed_join_aggregate(
    probe: ShardedTable,
    probe_refs: Dict[str, ast.ColumnRef],
    build: ShardedTable,
    build_refs: Dict[str, ast.ColumnRef],
    probe_key: ast.Expression,
    build_key: ast.Expression,
    probe_predicate: Optional[ast.Expression],
    build_predicate: Optional[ast.Expression],
    group_exprs: Sequence[ast.Expression],
    group_domains: Sequence[Tuple[int, int]],
    value_expr: ast.Expression,
    bucket_cap: int,
    join_out_cap: int,
):
    """Distributed equi-join + grouped SUM/COUNT (the Q3 pattern):
    shard-local filters, co-shuffle by key, shard-local sorted join,
    dense-slot aggregation, psum.  Returns (sums, counts, overflow)."""
    qmesh = probe.mesh
    n = qmesh.n
    n_slots = 1
    for _, size in group_domains:
        n_slots *= size
    p_cmap = _make_name_map(probe, probe_refs)
    b_cmap = _make_name_map(build, build_refs)

    def local(p_blocks, p_valids, p_rv, b_blocks, b_valids, b_rv):
        p_blocks = [b.reshape(-1) for b in p_blocks]
        p_valids = [v.reshape(-1) if v is not None else None for v in p_valids]
        p_rv_f = p_rv.reshape(-1)
        b_blocks = [b.reshape(-1) for b in b_blocks]
        b_valids = [v.reshape(-1) if v is not None else None for v in b_valids]
        b_rv_f = b_rv.reshape(-1)
        pt = _local_table(probe, p_blocks, p_valids, p_rv_f)
        bt = _local_table(build, b_blocks, b_valids, b_rv_f)
        pev = ExpressionEvaluator(pt, p_cmap)
        bev = ExpressionEvaluator(bt, b_cmap)
        p_mask = p_rv_f
        if probe_predicate is not None:
            p_mask = p_mask & pev.selection_mask(probe_predicate)
        b_mask = b_rv_f
        if build_predicate is not None:
            b_mask = b_mask & bev.selection_mask(build_predicate)
        pk = pev.evaluate(probe_key).data.astype(jnp.int64)
        bk = bev.evaluate(build_key).data.astype(jnp.int64)
        slot = dense_slots(pev, group_exprs, group_domains) if group_exprs \
            else jnp.zeros(pt.capacity, dtype=jnp.int32)
        val = pev.evaluate(value_expr)
        if val.validity is not None:
            # NULL values neither sum nor count (SUM/COUNT(v) semantics)
            p_mask = p_mask & val.validity
        vdata = jnp.where(p_mask, val.data, 0).astype(jnp.float64)
        # co-shuffle
        rpk, rpv, (rslot, rval), p_over = shf.shuffle_rows(
            pk, p_mask, (slot, vdata), n, bucket_cap
        )
        rbk, rbv, _, b_over = shf.shuffle_rows(bk, b_mask, (), n, bucket_cap)
        probe_idx, build_idx, pair_valid, _ = shf.local_equi_join(
            rbk, rbv, rpk, rpv, join_out_cap
        )
        pslot = jnp.take(rslot, probe_idx)
        pval = jnp.take(rval, probe_idx)
        seg = jnp.where(pair_valid, pslot, n_slots)
        sums = jax.lax.psum(
            jax.ops.segment_sum(pval, seg, num_segments=n_slots), SHARD_AXIS
        )
        counts = jax.lax.psum(
            jax.ops.segment_sum(pair_valid.astype(jnp.int64), seg,
                                num_segments=n_slots), SHARD_AXIS
        )
        overflow = jax.lax.psum(p_over + b_over, SHARD_AXIS)
        return sums.reshape(1, -1), counts.reshape(1, -1), overflow.reshape(1)

    sharded = shard_map(
        local,
        mesh=qmesh.mesh,
        in_specs=(
            P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(SHARD_AXIS, None),
            P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(SHARD_AXIS, None),
        ),
        out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None), P(SHARD_AXIS)),
        check_vma=False,
    )
    pd_, pv_, prv = _flatten_sharded(probe)
    bd_, bv_, brv = _flatten_sharded(build)

    @jax.jit
    def run(pd_, pv_, prv, bd_, bv_, brv):
        s, c, o = sharded(pd_, pv_, prv, bd_, bv_, brv)
        return s[0], c[0], o[0]

    sums, counts, overflow = run(pd_, pv_, prv, bd_, bv_, brv)
    return np.asarray(sums), np.asarray(counts), int(overflow)

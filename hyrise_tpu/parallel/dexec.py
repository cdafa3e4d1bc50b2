"""Distributed SQL execution: lower optimized LQP subtrees onto the mesh.

The planner pass `rewrite_distributed` walks an optimized logical plan;
every maximal subtree whose leaves are mesh-partitioned tables and whose
nodes are supported (scan / filter / projection / inner+semi+anti join /
aggregate) executes DISTRIBUTED — shard-local stages built from the same
vectorized ExpressionEvaluator the single-chip engine uses, stitched with
XLA collectives:

- filters/projections: embarrassingly parallel (no communication)
- joins: broadcast the build side over ICI (`all_gather`) when it is
  small, else co-shuffle both sides by key hash (`all_to_all`) and join
  shard-locally; match counts sync once per join to size the static
  output, and bucket/output overflow triggers a host retry with doubled
  capacity (the skew story: capacity grows until the hot key fits —
  ref analogue: join_hash.cpp:70-110 partition-until-it-fits)
- aggregates: local pre-aggregation by sorted grouping (this collapses
  skewed keys BEFORE any communication), shuffle of the per-shard group
  representatives, then a combining aggregation; decomposable partials
  (sum/count/min/max/sumsq) carry across the wire
- string keys/groups: sorted host dictionaries recode through merged-
  dictionary LUTs applied shard-locally (ref analogue: the single-chip
  merged-dictionary recode, operators/joins.py)

The executed subtree's (small) result gathers to the host and re-enters
the plan as a StaticTableNode; sort/having/window and anything
unsupported continue on the single-chip engine.  ORDER BY + LIMIT above
a lowerable subtree lowers as shard-local top-k: each shard keeps only
its k best rows by the global sort order, so the final gather moves at
most k*n_shards rows (see `_topk`).  Because EVERY sharded leaf is at
minimum gatherable, any SQL statement over distributed tables still
executes.

Known limits (by design, documented in PARITY.md): sharded tables are
read-optimized — they carry no MVCC sidecar, and DML against them raises
(drop the sharded twin and re-distribute after bulk maintenance); outer
joins, distinct aggregates and window subtrees gather and continue
single-chip.

Reference being re-expressed: NUMA scheduling + per-chunk parallelism
(node_queue_scheduler.hpp:76, join_hash.cpp:306-327) — SURVEY §2.17 maps
these to SPMD sharding + collectives, which is what this module does.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from hyrise_tpu.expression import ast
from hyrise_tpu.expression.evaluator import ExpressionEvaluator
from hyrise_tpu.parallel import shuffle as shf
from hyrise_tpu.parallel.dtable import (
    DColumn,
    DTable,
    dtable_signature,
    flatten_dtable,
    gather_dtable,
    local_table,
    run_dstage,
)
from hyrise_tpu.parallel.mesh import SHARD_AXIS
from hyrise_tpu.parallel.multihost import sync_scalar_int
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.plan.lqp_translator import _side_of, _to_join_predicate
from hyrise_tpu.storage.column import merge_dictionaries
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import (
    AggregateFunction,
    DataType,
    JoinMode,
    LANE,
    PredicateCondition,
    padded_size,
)

_PS = P(SHARD_AXIS, None)
_P1 = P(SHARD_AXIS)

# build sides at or below this row estimate broadcast instead of shuffling
BROADCAST_LIMIT = 65_536
# hard stop for capacity-doubling retries (rows per (src,dst) bucket)
MAX_BUCKET_CAP = 1 << 24

_JOINABLE_KEYS = (DataType.INT, DataType.LONG, DataType.DATE, DataType.STRING)

_AGG_SUPPORTED = (
    AggregateFunction.MIN, AggregateFunction.MAX, AggregateFunction.SUM,
    AggregateFunction.AVG, AggregateFunction.COUNT,
    AggregateFunction.STDDEV_SAMP, AggregateFunction.ANY,
)


class DistributedUnsupported(Exception):
    """Raised when a plan shape cannot be lowered (caller falls back)."""


# introspection for tests/meta tables: counts of distributed work executed
STATS = {"subtrees": 0, "nodes": 0, "joins": 0, "aggregates": 0,
         "shuffle_retries": 0, "topk": 0}


def reset_stats() -> None:
    for k in STATS:
        STATS[k] = 0


# ======================================================================
# planner pass
# ======================================================================


def references_sharded(root: L.LQPNode, storage_manager) -> bool:
    return any(
        isinstance(n, L.StoredTableNode) and storage_manager.is_sharded(n.table_name)
        for n in root.walk()
    )


def rewrite_distributed(root: L.LQPNode) -> L.LQPNode:
    """Execute every maximal sharded subtree on the mesh; return a NEW
    plan (the cached LQP is never mutated) with those subtrees replaced
    by StaticTableNodes holding the gathered results."""
    lowering = _Lowering()

    def rec(node: L.LQPNode) -> L.LQPNode:
        # Distributed top-k: Limit(Sort(lowerable)) keeps only the k best
        # rows PER SHARD on-device before gathering, so the final stage
        # moves at most k*n_shards rows instead of the whole subtree
        # result (ref: operators/sort.cpp:423 + SURVEY §2.17 — the
        # ORDER-BY-LIMIT cliff for Q3/Q10-shaped plans).  The single-chip
        # Sort+Limit re-run on the gathered superset preserves exact
        # ordering/tie semantics.
        if (isinstance(node, L.LimitNode)
                and isinstance(node.left, L.SortNode)
                and lowering.lowerable(node.left.left)):
            k = _literal_rows(node.row_count)
            off = 0 if node.offset is None else _literal_rows(node.offset)
            if k is not None and off is not None:
                try:
                    dt = lowering.execute(node.left.left)
                    dt = _topk(dt, node.left.sort_items, k + off)
                    out_exprs = node.left.left.output_expressions()
                    table = gather_dtable(dt.select(out_exprs))
                    STATS["subtrees"] += 1
                    STATS["topk"] += 1
                    STATS["nodes"] += sum(1 for _ in node.left.left.walk())
                    static = L.StaticTableNode(table, out_exprs)
                    sort_clone = copy.copy(node.left)
                    sort_clone.left = static
                    limit_clone = copy.copy(node)
                    limit_clone.left = sort_clone
                    return limit_clone
                except DistributedUnsupported:
                    pass
        if lowering.lowerable(node):
            try:
                dt = lowering.execute(node)
                out_exprs = node.output_expressions()
                table = gather_dtable(dt.select(out_exprs))
                STATS["subtrees"] += 1
                STATS["nodes"] += sum(1 for _ in node.walk())
                return L.StaticTableNode(table, out_exprs)
            except DistributedUnsupported:
                pass  # fall through to per-child lowering
        clone = copy.copy(node)
        if node.left is not None:
            clone.left = rec(node.left)
        if node.right is not None:
            clone.right = rec(node.right)
        return clone

    return rec(root)


class _Lowering:
    def __init__(self):
        from hyrise_tpu.database import Database
        from hyrise_tpu.statistics.cardinality import CardinalityEstimator

        self.db = Database.get()
        self.sm = self.db.storage_manager
        self.est = CardinalityEstimator()
        self._memo: Dict[int, bool] = {}

    # ------------------------------------------------------------ analysis

    def lowerable(self, node: L.LQPNode) -> bool:
        hit = self._memo.get(id(node))
        if hit is not None:
            return hit
        ok = self._lowerable(node)
        self._memo[id(node)] = ok
        return ok

    def _lowerable(self, node: L.LQPNode) -> bool:
        t = type(node)
        if t is L.StoredTableNode:
            return (
                self.sm.is_sharded(node.table_name)
                and not node.include_row_ids
            )
        if t is L.ValidateNode:
            # sharded tables are read-optimized (no MVCC sidecar): the
            # visibility filter is a no-op
            return self.lowerable(node.left) and all(
                self.sm.get_table(n.table_name).mvcc is None
                for n in node.walk() if isinstance(n, L.StoredTableNode)
            )
        if t is L.PredicateNode:
            return self.lowerable(node.left) and _no_subquery([node.predicate])
        if t is L.ProjectionNode:
            if not self.lowerable(node.left):
                return False
            # An expression that IS a child output column (incl. aggregate
            # results above an AggregateNode) forwards without evaluation —
            # the evaluator resolves cmap keys before dispatch.  Computed
            # expressions must be aggregate/window/subquery-free.
            child_keys = {e.key() for e in node.left.output_expressions()}
            for e in node.expressions:
                if e.key() in child_keys:
                    continue
                if not _no_subquery([e]) or e.contains_aggregate() or any(
                    isinstance(s, ast.WindowExpression) for s in e.walk()
                ):
                    return False
            return True
        if t is L.JoinNode:
            return self._join_lowerable(node)
        if t is L.AggregateNode:
            if not self.lowerable(node.left):
                return False
            if not _no_subquery(node.node_expressions()):
                return False
            for agg in node.aggregates:
                if not isinstance(agg, ast.AggregateExpression):
                    return False
                if agg.distinct or agg.function not in _AGG_SUPPORTED:
                    return False
            for e in node.group_by + node.dependent:
                if e.data_type() == DataType.STRING and not isinstance(
                    e, ast.ColumnRef
                ):
                    return False  # dictionary only known per-column
            return True
        return False

    def _join_lowerable(self, node: L.JoinNode) -> bool:
        if node.mode not in (JoinMode.INNER, JoinMode.SEMI,
                             JoinMode.ANTI_NULL_AS_FALSE,
                             JoinMode.ANTI_NULL_AS_TRUE):
            return False
        if not (self.lowerable(node.left) and self.lowerable(node.right)):
            return False
        if not _no_subquery(node.predicates):
            return False
        lk = {e.key() for e in node.left.output_expressions()}
        rk = {e.key() for e in node.right.output_expressions()}
        primary = None
        n_secondary = 0
        for p in node.predicates:
            jp = _to_join_predicate(p, lk, rk)
            if jp is None:
                if _side_of(p, lk, rk) is None:
                    return False
            elif primary is None and jp.condition == PredicateCondition.EQUALS:
                primary = jp
            else:
                n_secondary += 1
        if primary is None:
            return False
        for e in (primary.left, primary.right):
            dt_ = e.data_type()
            if dt_ not in _JOINABLE_KEYS:
                return False
            if dt_ == DataType.STRING and not isinstance(e, ast.ColumnRef):
                return False
        if node.mode != JoinMode.INNER and n_secondary:
            return False  # semi/anti with residual predicates: fall back
        return True

    # ------------------------------------------------------------ execute

    def execute(self, node: L.LQPNode) -> DTable:
        t = type(node)
        if t is L.StoredTableNode:
            sharded = self.sm.get_sharded_table(node.table_name)
            return sharded.dtable_for(node.output_expressions())
        if t is L.ValidateNode:
            return self.execute(node.left)
        if t is L.PredicateNode:
            return _filter(self.execute(node.left), node.predicate)
        if t is L.ProjectionNode:
            return _project(self.execute(node.left), node.expressions)
        if t is L.JoinNode:
            STATS["joins"] += 1
            return self._execute_join(node)
        if t is L.AggregateNode:
            STATS["aggregates"] += 1
            return _aggregate(self.execute(node.left), node)
        raise DistributedUnsupported(type(node).__name__)

    def _execute_join(self, node: L.JoinNode) -> DTable:
        ldt = self.execute(node.left)
        rdt = self.execute(node.right)
        lk = {e.key() for e in node.left.output_expressions()}
        rk = {e.key() for e in node.right.output_expressions()}
        primary = None
        secondary: List[ast.Expression] = []
        for p in node.predicates:
            jp = _to_join_predicate(p, lk, rk)
            if jp is None:
                side = _side_of(p, lk, rk)
                if side == "left":
                    ldt = _filter(ldt, p)
                else:
                    rdt = _filter(rdt, p)
            elif primary is None and jp.condition == PredicateCondition.EQUALS:
                primary = jp
            else:
                secondary.append(p)
        assert primary is not None

        l_est = self._estimate(node.left, ldt)
        r_est = self._estimate(node.right, rdt)

        if node.mode == JoinMode.INNER:
            # probe = bigger side stays put / moves less; build = smaller
            if r_est <= l_est:
                probe, build = ldt, rdt
                pk_e, bk_e = primary.left, primary.right
                build_est = r_est
            else:
                probe, build = rdt, ldt
                pk_e, bk_e = primary.right, primary.left
                build_est = l_est
            return _inner_join(probe, build, pk_e, bk_e, secondary,
                               node.output_expressions(),
                               broadcast=build_est <= BROADCAST_LIMIT)
        # semi/anti: probe side is ALWAYS the left (output) side
        return _semi_anti_join(
            ldt, rdt, primary.left, primary.right, node.mode,
            broadcast=r_est <= BROADCAST_LIMIT,
        )

    def _estimate(self, node: L.LQPNode, dt: DTable) -> float:
        try:
            est = self.est.estimate(node)
            if est is not None:
                return float(est)
        except Exception:
            pass
        return float(dt.est_rows or (dt.n_shards * dt.rows_per_shard))


def _literal_rows(e: ast.Expression) -> Optional[int]:
    """Literal LIMIT/OFFSET row count, or None when not statically known."""
    if isinstance(e, ast.Literal) and isinstance(e.value, (int, np.integer)):
        v = int(e.value)
        return v if 0 <= v <= 1_000_000 else None
    return None


def _topk(dt: DTable, sort_items, k: int) -> DTable:
    """Shard-local top-k by the GLOBAL sort order: sort each shard's rows
    by (row-validity, per-item null-order, key...) and keep the first k.
    The union over shards is a superset of the global top-k, so the host
    Sort+Limit above reproduces exact semantics on k*n_shards rows."""
    kp = padded_size(max(k, LANE), LANE)
    if kp >= dt.rows_per_shard:
        return dt  # no reduction possible
    # pre-validate sortability (host-side; raises before any device work)
    for e, _m in sort_items:
        if e.data_type() == DataType.STRING:
            col = dt.column_for(e) if isinstance(e, ast.ColumnRef) else None
            if col is None or col.dictionary is None or not col.dict_sorted:
                raise DistributedUnsupported("unsorted string sort key")
    sig = ("dtopk", tuple((e.key(), m) for e, m in sort_items), kp,
           dtable_signature(dt))
    datas, valids, rv = flatten_dtable(dt)
    mesh = dt.mesh

    def build():
        def local(datas, valids, rv):
            t, cm, d_f, v_f, rvf = _flat_cols(dt, datas, valids, rv)
            ev = ExpressionEvaluator(t, cm)
            keys = [(~rvf).astype(jnp.int32)]  # invalid rows sort last
            for e, m in sort_items:
                r = ev.evaluate(e)
                data = r.data
                if data.dtype == jnp.bool_:
                    data = data.astype(jnp.int32)
                desc = not m.ascending
                if jnp.issubdtype(data.dtype, jnp.floating):
                    key = -data if desc else data  # no 64-bit bitcasts on TPU
                else:
                    key = data.astype(jnp.int64)
                    if desc:
                        key = -key
                if r.validity is not None:
                    null_rank = (r.validity if m.nulls_first
                                 else ~r.validity).astype(jnp.int32)
                    keys.append(null_rank)
                    key = jnp.where(r.validity, key,
                                    jnp.zeros((), key.dtype))
                keys.append(key)
            idx = jnp.arange(rvf.shape[0], dtype=jnp.int32)
            sorted_ops = jax.lax.sort(tuple(keys) + (idx,),
                                      num_keys=len(keys))
            take = jax.lax.slice_in_dim(sorted_ops[-1], 0, kp)
            out_d, out_v = _take_cols(d_f, v_f, take)
            rv2 = jnp.take(rvf, take)
            return (
                [d.reshape(1, -1) for d in out_d],
                [v.reshape(1, -1) if v is not None else None
                 for v in out_v],
                rv2.reshape(1, -1),
            )

        fn = jax.jit(shard_map(
            local, mesh=mesh.mesh, in_specs=(_PS, _PS, _PS),
            out_specs=(_PS, _PS, _PS), check_vma=False,
        ))
        return fn, {}

    (out_d, out_v, rv2), _ = run_dstage(sig, build, (datas, valids, rv))
    cols = [
        DColumn(d, v, m[0], m[1], m[2])
        for d, v, m in zip(out_d, out_v, _col_metas(dt))
    ]
    est = dt.est_rows
    return DTable(list(dt.exprs), cols, rv2, mesh,
                  min(est, kp * mesh.n) if est else kp * mesh.n)


def _no_subquery(exprs: Sequence[ast.Expression]) -> bool:
    return not any(
        isinstance(sub, (ast.Subquery, ast.InSubquery, ast.Exists))
        for e in exprs for sub in e.walk()
    )


# ======================================================================
# stages
# ======================================================================


def _filter(dt: DTable, predicate: ast.Expression) -> DTable:
    sig = ("dfilter", predicate.key(), dtable_signature(dt))
    datas, valids, rv = flatten_dtable(dt)
    mesh = dt.mesh

    def build():
        def local(datas, valids, rv):
            datas = [d.reshape(-1) for d in datas]
            valids = [v.reshape(-1) if v is not None else None for v in valids]
            rvf = rv.reshape(-1)
            t, cmap = local_table(dt, datas, valids, rvf)
            ev = ExpressionEvaluator(t, cmap)
            return (rvf & ev.selection_mask(predicate)).reshape(1, -1)

        fn = jax.jit(shard_map(
            local, mesh=mesh.mesh, in_specs=(_PS, _PS, _PS), out_specs=_PS,
            check_vma=False,
        ))
        return fn, {}

    rv2, _ = run_dstage(sig, build, (datas, valids, rv))
    out = DTable(dt.exprs, dt.columns, rv2, mesh, dt.est_rows)
    return out


def _project(dt: DTable, exprs: Sequence[ast.Expression]) -> DTable:
    cmap = dt.cmap()
    if all(e.key() in cmap for e in exprs):
        return dt.select(exprs)  # pure column selection — no device work
    sig = ("dproject", tuple(e.key() for e in exprs), dtable_signature(dt))
    datas, valids, rv = flatten_dtable(dt)
    mesh = dt.mesh

    def build():
        cell = {}

        def local(datas, valids, rv):
            datas = [d.reshape(-1) for d in datas]
            valids = [v.reshape(-1) if v is not None else None for v in valids]
            rvf = rv.reshape(-1)
            t, cm = local_table(dt, datas, valids, rvf)
            ev = ExpressionEvaluator(t, cm)
            out_data, out_valid, meta = [], [], []
            for e in exprs:
                col = ev.evaluate(e).to_column()
                out_data.append(col.data.reshape(1, -1))
                out_valid.append(
                    col.validity.reshape(1, -1)
                    if col.validity is not None else None
                )
                meta.append((col.data_type, col.dictionary, col.dict_sorted))
            cell["meta"] = meta
            return out_data, out_valid

        fn = jax.jit(shard_map(
            local, mesh=mesh.mesh, in_specs=(_PS, _PS, _PS),
            out_specs=(_PS, _PS), check_vma=False,
        ))
        return fn, cell

    (out_data, out_valid), meta = run_dstage(sig, build, (datas, valids, rv))
    cols = [
        DColumn(d, v, m[0], m[1], m[2])
        for d, v, m in zip(out_data, out_valid, meta)
    ]
    return DTable(list(exprs), cols, rv, mesh, dt.est_rows)


# ---------------------------------------------------------------- joins


def _key_luts(dt_a: DTable, e_a: ast.Expression,
              dt_b: DTable, e_b: ast.Expression):
    """Host LUTs recoding both sides' dictionary codes into a merged
    dictionary (string join keys); (None, None) for numeric keys."""
    if e_a.data_type() != DataType.STRING:
        return None, None
    da = dt_a.column_for(e_a).dictionary
    db_ = dt_b.column_for(e_b).dictionary
    if da is None or db_ is None:
        raise DistributedUnsupported("string key without dictionary")
    merged = merge_dictionaries(da, db_)
    lut_a = None if merged is da else np.searchsorted(merged, da).astype(np.int32)
    lut_b = None if merged is db_ else np.searchsorted(merged, db_).astype(np.int32)
    return lut_a, lut_b


def _eval_key(ev: ExpressionEvaluator, expr: ast.Expression, lut,
              row_valid: jax.Array):
    r = ev.evaluate(expr)
    data = r.data
    if lut is not None:
        larr = jnp.asarray(lut)
        data = jnp.take(larr, jnp.clip(data, 0, larr.shape[0] - 1))
    keys = data.astype(jnp.int64)
    valid = row_valid if r.validity is None else (row_valid & r.validity)
    return keys, valid


def _flat_cols(dt: DTable, datas, valids, rv):
    datas = [d.reshape(-1) for d in datas]
    valids = [v.reshape(-1) if v is not None else None for v in valids]
    rvf = rv.reshape(-1)
    t, cmap = local_table(dt, datas, valids, rvf)
    return t, cmap, datas, valids, rvf


def _take_cols(datas, valids, idx):
    out_d = [jnp.take(d, idx) for d in datas]
    out_v = [jnp.take(v, idx) if v is not None else None for v in valids]
    return out_d, out_v


def _pair_table(exprs, cols_d, cols_v, metas, cap):
    from hyrise_tpu.storage.column import Column

    cols = [
        Column(m[0], d, v, m[1], m[2])
        for d, v, m in zip(cols_d, cols_v, metas)
    ]
    names = [f"j{i}" for i in range(len(cols))]
    t = Table(names, cols, cap)
    cmap = {e.key(): i for i, e in enumerate(exprs)}
    return t, cmap


def _col_metas(dt: DTable):
    return [(c.dtype, c.dictionary, c.dict_sorted) for c in dt.columns]


def _inner_join(probe: DTable, build: DTable, pk_e, bk_e,
                secondary: Sequence[ast.Expression],
                out_exprs: Sequence[ast.Expression],
                broadcast: bool) -> DTable:
    """Distributed inner equi-join.  Output columns = probe cols then
    build cols, re-ordered to `out_exprs` at the end (probe may be either
    plan input — the smaller estimated side builds)."""
    mesh = probe.mesh
    n = mesh.n
    lut_p, lut_b = _key_luts(probe, pk_e, build, bk_e)
    p_args = flatten_dtable(probe)
    b_args = flatten_dtable(build)
    est = float(probe.est_rows or probe.rows_per_shard * n)
    bucket_cap = _initial_bucket_cap(probe, build)
    out_cap = padded_size(
        max(LANE, min(2 * probe.rows_per_shard,
                      int(2 * est / n) + LANE)), LANE
    )

    mode = "bcast" if broadcast else "shuffle"
    metas_p, metas_b = _col_metas(probe), _col_metas(build)
    join_exprs = list(probe.exprs) + list(build.exprs)

    while True:
        sig = ("djoin", mode, pk_e.key(), bk_e.key(),
               tuple(e.key() for e in secondary), bucket_cap, out_cap,
               dtable_signature(probe), dtable_signature(build))

        def build_stage():
            cell = {}

            def local(pd, pv, prv, bd, bv, brv):
                pt, pcm, pd_f, pv_f, prv_f = _flat_cols(probe, pd, pv, prv)
                bt, bcm, bd_f, bv_f, brv_f = _flat_cols(build, bd, bv, brv)
                pev = ExpressionEvaluator(pt, pcm)
                bev = ExpressionEvaluator(bt, bcm)
                pkeys, pvalid = _eval_key(pev, pk_e, lut_p, prv_f)
                bkeys, bvalid = _eval_key(bev, bk_e, lut_b, brv_f)
                shuf_over = jnp.zeros((), jnp.int64)
                if broadcast:
                    bk_all = jax.lax.all_gather(bkeys, SHARD_AXIS, tiled=True)
                    bv_all = jax.lax.all_gather(bvalid, SHARD_AXIS, tiled=True)
                    bcols_d = [
                        jax.lax.all_gather(d, SHARD_AXIS, tiled=True)
                        for d in bd_f
                    ]
                    bcols_v = [
                        jax.lax.all_gather(v, SHARD_AXIS, tiled=True)
                        if v is not None else None for v in bv_f
                    ]
                    pcols_d, pcols_v = pd_f, pv_f
                    pk_s, pv_s = pkeys, pvalid
                else:
                    # bloom semi-join pruning: probe rows whose key cannot
                    # be in the (global) build side skip the shuffle
                    # (ref: join_hash_steps.hpp:252 bloom before probing)
                    bloom = shf.bloom_build(bkeys, bvalid)
                    pvalid = pvalid & shf.bloom_probe(bloom, pkeys)
                    p_pay = tuple(pd_f) + tuple(
                        v for v in pv_f if v is not None)
                    b_pay = tuple(bd_f) + tuple(
                        v for v in bv_f if v is not None)
                    pk_s, pv_s, rp, p_over = shf.shuffle_rows(
                        pkeys, pvalid, p_pay, n, bucket_cap)
                    bk_all, bv_all, rb, b_over = shf.shuffle_rows(
                        bkeys, bvalid, b_pay, n, bucket_cap)
                    shuf_over = p_over + b_over
                    pcols_d = list(rp[: len(pd_f)])
                    pcols_v, k = [], len(pd_f)
                    for v in pv_f:
                        if v is None:
                            pcols_v.append(None)
                        else:
                            pcols_v.append(rp[k])
                            k += 1
                    bcols_d = list(rb[: len(bd_f)])
                    bcols_v, k = [], len(bd_f)
                    for v in bv_f:
                        if v is None:
                            bcols_v.append(None)
                        else:
                            bcols_v.append(rb[k])
                            k += 1
                probe_idx, build_idx, pair_valid, total = shf.local_equi_join(
                    bk_all, bv_all, pk_s, pv_s, out_cap)
                join_over = jnp.maximum(total - out_cap, 0)
                out_d, out_v = _take_cols(pcols_d, pcols_v, probe_idx)
                bo_d, bo_v = _take_cols(bcols_d, bcols_v, build_idx)
                out_d += bo_d
                out_v += bo_v
                if secondary:
                    t2, cm2 = _pair_table(
                        join_exprs, out_d, out_v, metas_p + metas_b, out_cap)
                    ev2 = ExpressionEvaluator(t2, cm2)
                    for p in secondary:
                        pair_valid = pair_valid & ev2.selection_mask(p)
                cell["meta"] = True
                return (
                    [d.reshape(1, -1) for d in out_d],
                    [v.reshape(1, -1) if v is not None else None
                     for v in out_v],
                    pair_valid.reshape(1, -1),
                    jax.lax.pmax(shuf_over, SHARD_AXIS).reshape(1),
                    jax.lax.pmax(join_over, SHARD_AXIS).reshape(1),
                )

            fn = jax.jit(shard_map(
                local, mesh=mesh.mesh,
                in_specs=(_PS, _PS, _PS, _PS, _PS, _PS),
                out_specs=(_PS, _PS, _PS, _P1, _P1), check_vma=False,
            ))
            return fn, cell

        (out_d, out_v, pair_valid, s_over, j_over), _ = run_dstage(
            sig, build_stage, p_args + b_args)
        s_over_i = sync_scalar_int(s_over)
        j_over_i = sync_scalar_int(j_over)
        if s_over_i == 0 and j_over_i == 0:
            break
        STATS["shuffle_retries"] += 1
        if s_over_i:
            bucket_cap *= 2
        if j_over_i:
            out_cap = padded_size(out_cap + j_over_i, LANE)
        if bucket_cap > MAX_BUCKET_CAP or out_cap > MAX_BUCKET_CAP * n:
            raise DistributedUnsupported("join exceeds retry capacity")

    cols = [
        DColumn(d, v, m[0], m[1], m[2])
        for d, v, m in zip(out_d, out_v, metas_p + metas_b)
    ]
    out = DTable(join_exprs, cols, pair_valid, mesh, None)
    return out.select(out_exprs)


def _semi_anti_join(probe: DTable, build: DTable, pk_e, bk_e,
                    mode: JoinMode, broadcast: bool) -> DTable:
    mesh = probe.mesh
    n = mesh.n
    lut_p, lut_b = _key_luts(probe, pk_e, build, bk_e)
    p_args = flatten_dtable(probe)
    b_args = flatten_dtable(build)
    bucket_cap = _initial_bucket_cap(probe, build)

    while True:
        sig = ("dsemi", mode, broadcast, pk_e.key(), bk_e.key(), bucket_cap,
               dtable_signature(probe), dtable_signature(build))

        def build_stage():
            def local(pd, pv, prv, bd, bv, brv):
                pt, pcm, pd_f, pv_f, prv_f = _flat_cols(probe, pd, pv, prv)
                bt, bcm, bd_f, bv_f, brv_f = _flat_cols(build, bd, bv, brv)
                pev = ExpressionEvaluator(pt, pcm)
                bev = ExpressionEvaluator(bt, bcm)
                pkeys, pvalid = _eval_key(pev, pk_e, lut_p, prv_f)
                bkeys, bvalid = _eval_key(bev, bk_e, lut_b, brv_f)
                # ANTI_NULL_AS_TRUE (NOT IN): any NULL build key voids all
                bnull = jax.lax.psum(
                    jnp.sum((brv_f & ~bvalid).astype(jnp.int64)), SHARD_AXIS)
                shuf_over = jnp.zeros((), jnp.int64)
                if broadcast:
                    bk_all = jax.lax.all_gather(bkeys, SHARD_AXIS, tiled=True)
                    bv_all = jax.lax.all_gather(bvalid, SHARD_AXIS, tiled=True)
                    pk_s, pv_s, prv_s = pkeys, pvalid, prv_f
                    pcols_d, pcols_v = pd_f, pv_f
                else:
                    # anti joins must route NULL-key rows too (they are
                    # kept in the output); key validity travels as payload
                    p_pay = tuple(pd_f) + tuple(
                        v for v in pv_f if v is not None) + (pvalid, prv_f)
                    if mode == JoinMode.SEMI:
                        # bloom pruning (safe for SEMI only: ANTI keeps
                        # the non-matching rows a bloom would drop)
                        bloom = shf.bloom_build(bkeys, bvalid)
                        route_valid = pvalid & shf.bloom_probe(bloom, pkeys)
                    else:
                        route_valid = prv_f
                    pk_s, _, rp, p_over = shf.shuffle_rows(
                        pkeys, route_valid, p_pay, n, bucket_cap)
                    bk_all, bv_all, _, b_over = shf.shuffle_rows(
                        bkeys, bvalid, (), n, bucket_cap)
                    shuf_over = p_over + b_over
                    pcols_d = list(rp[: len(pd_f)])
                    pcols_v, k = [], len(pd_f)
                    for v in pv_f:
                        if v is None:
                            pcols_v.append(None)
                        else:
                            pcols_v.append(rp[k])
                            k += 1
                    pv_s = rp[-2]  # empty slots scatter-fill to False
                    prv_s = rp[-1]
                skeys = jnp.where(bv_all, bk_all, shf.I64_MAX)
                sorted_keys = jnp.sort(skeys)
                left = jnp.searchsorted(sorted_keys, pk_s, side="left")
                right = jnp.searchsorted(sorted_keys, pk_s, side="right")
                match = pv_s & (right > left)
                if mode == JoinMode.SEMI:
                    rv2 = prv_s & match
                elif mode == JoinMode.ANTI_NULL_AS_FALSE:
                    rv2 = prv_s & ~match
                else:  # ANTI_NULL_AS_TRUE
                    rv2 = prv_s & ~match & pv_s & (bnull == 0)
                return (
                    [d.reshape(1, -1) for d in pcols_d],
                    [v.reshape(1, -1) if v is not None else None
                     for v in pcols_v],
                    rv2.reshape(1, -1),
                    jax.lax.pmax(shuf_over, SHARD_AXIS).reshape(1),
                )

            fn = jax.jit(shard_map(
                local, mesh=mesh.mesh,
                in_specs=(_PS, _PS, _PS, _PS, _PS, _PS),
                out_specs=(_PS, _PS, _PS, _P1), check_vma=False,
            ))
            return fn, {}

        (out_d, out_v, rv2, s_over), _ = run_dstage(
            sig, build_stage, p_args + b_args)
        if sync_scalar_int(s_over) == 0:
            break
        STATS["shuffle_retries"] += 1
        bucket_cap *= 2
        if bucket_cap > MAX_BUCKET_CAP:
            raise DistributedUnsupported("semi join exceeds retry capacity")

    cols = [
        DColumn(d, v, m[0], m[1], m[2])
        for d, v, m in zip(out_d, out_v, _col_metas(probe))
    ]
    return DTable(list(probe.exprs), cols, rv2, mesh, probe.est_rows)


def _initial_bucket_cap(a: DTable, b: DTable) -> int:
    rps = max(a.rows_per_shard, b.rows_per_shard)
    return padded_size(max(LANE, 2 * rps // max(a.mesh.n, 1)), LANE)


# ------------------------------------------------------------- aggregate


def _aggregate(dt: DTable, node: L.AggregateNode) -> DTable:
    if not node.group_by:
        return _global_aggregate(dt, node)
    return _grouped_aggregate(dt, node)


def _acc_dtype(vals):
    return (jnp.float64 if jnp.issubdtype(vals.dtype, jnp.floating)
            else jnp.int64)


def _minmax_identity(vals, is_min: bool):
    if jnp.issubdtype(vals.dtype, jnp.floating):
        return jnp.asarray(jnp.inf if is_min else -jnp.inf, vals.dtype)
    info = jnp.iinfo(vals.dtype)
    return jnp.asarray(info.max if is_min else info.min, vals.dtype)


def _partials(fn: AggregateFunction, vals, valid, seg, nseg, row_valid):
    """First-pass per-group partials (decomposable across shards)."""
    if fn == AggregateFunction.COUNT and vals is None:  # COUNT(*)
        return (jax.ops.segment_sum(row_valid.astype(jnp.int64), seg,
                                    num_segments=nseg),)
    cnt = jax.ops.segment_sum(valid.astype(jnp.int64), seg, num_segments=nseg)
    if fn == AggregateFunction.COUNT:
        return (cnt,)
    if fn in (AggregateFunction.SUM, AggregateFunction.AVG):
        s = jax.ops.segment_sum(
            jnp.where(valid, vals, 0).astype(_acc_dtype(vals)), seg,
            num_segments=nseg)
        return (s, cnt)
    if fn in (AggregateFunction.MIN, AggregateFunction.MAX,
              AggregateFunction.ANY):
        is_min = fn == AggregateFunction.MIN
        ident = _minmax_identity(vals, is_min)
        masked = jnp.where(valid, vals, ident)
        red = (jax.ops.segment_min if is_min else jax.ops.segment_max)(
            masked, seg, num_segments=nseg)
        return (red, cnt)
    if fn == AggregateFunction.STDDEV_SAMP:
        v64 = vals.astype(jnp.float64)
        s = jax.ops.segment_sum(jnp.where(valid, v64, 0.0), seg,
                                num_segments=nseg)
        s2 = jax.ops.segment_sum(jnp.where(valid, v64 * v64, 0.0), seg,
                                 num_segments=nseg)
        return (s, s2, cnt)
    raise DistributedUnsupported(fn)


def _combine(fn: AggregateFunction, parts, valid, seg, nseg):
    """Second-pass combine of shuffled partials (same shapes as first)."""
    out = []
    for i, p in enumerate(parts):
        if fn in (AggregateFunction.MIN, AggregateFunction.MAX,
                  AggregateFunction.ANY) and i == 0:
            is_min = fn == AggregateFunction.MIN
            ident = _minmax_identity(p, is_min)
            masked = jnp.where(valid, p, ident)
            out.append((jax.ops.segment_min if is_min else jax.ops.segment_max)(
                masked, seg, num_segments=nseg))
        else:
            out.append(jax.ops.segment_sum(
                jnp.where(valid, p, jnp.zeros((), p.dtype)), seg,
                num_segments=nseg))
    return tuple(out)


def _finalize(fn: AggregateFunction, parts, arg_expr: Optional[ast.Expression]):
    """(data, validity, DataType) from combined partials; `arg_expr` is the
    aggregate's ARGUMENT expression (None only for COUNT(*))."""
    if fn == AggregateFunction.COUNT:
        return parts[0], None, DataType.LONG
    if fn == AggregateFunction.SUM:
        s, c = parts
        dt_ = (DataType.LONG if s.dtype == jnp.int64 else DataType.DOUBLE)
        return s, c > 0, dt_
    if fn == AggregateFunction.AVG:
        s, c = parts
        return (s.astype(jnp.float64) / jnp.maximum(c, 1), c > 0,
                DataType.DOUBLE)
    if fn in (AggregateFunction.MIN, AggregateFunction.MAX,
              AggregateFunction.ANY):
        v, c = parts
        return v, c > 0, arg_expr.data_type()
    if fn == AggregateFunction.STDDEV_SAMP:
        s, s2, c = parts
        cf = c.astype(jnp.float64)
        var = (s2 - s * s / jnp.maximum(cf, 1.0)) / jnp.maximum(cf - 1.0, 1.0)
        return jnp.sqrt(jnp.maximum(var, 0.0)), c > 1, DataType.DOUBLE
    raise DistributedUnsupported(fn)


def _agg_specs(node: L.AggregateNode) -> List[Tuple[AggregateFunction,
                                                    Optional[ast.Expression],
                                                    ast.Expression]]:
    """(function, argument, expr) for dependent + aggregate outputs
    (dependent columns behave as ANY: key-determined, one value/group)."""
    specs = []
    for e in node.dependent:
        specs.append((AggregateFunction.ANY, e, e))
    for agg in node.aggregates:
        specs.append((agg.function, agg.argument, agg))
    return specs


def _global_aggregate(dt: DTable, node: L.AggregateNode) -> DTable:
    sig = ("dagg_global", node.semantic_key(), dtable_signature(dt))
    datas, valids, rv = flatten_dtable(dt)
    mesh = dt.mesh
    specs = _agg_specs(node)

    def build():
        cell = {}

        def local(datas, valids, rv):
            t, cm, d_f, v_f, rvf = _flat_cols(dt, datas, valids, rv)
            ev = ExpressionEvaluator(t, cm)
            seg0 = jnp.zeros(rvf.shape[0], dtype=jnp.int32)
            outs, metas = [], []
            for fn, arg, expr in specs:
                if arg is None:
                    vals, avalid = None, rvf
                else:
                    r = ev.evaluate(arg)
                    vals = r.data
                    avalid = rvf if r.validity is None else (rvf & r.validity)
                parts = _partials(fn, vals, avalid, seg0, 1, rvf)
                parts = tuple(
                    jax.lax.pmin(p, SHARD_AXIS)
                    if fn == AggregateFunction.MIN and i == 0
                    else jax.lax.pmax(p, SHARD_AXIS)
                    if fn in (AggregateFunction.MAX, AggregateFunction.ANY)
                    and i == 0
                    else jax.lax.psum(p, SHARD_AXIS)
                    for i, p in enumerate(parts)
                )
                data, validity, dt_out = _finalize(fn, parts, arg)
                dict_out = None
                sorted_out = True
                if arg is not None and dt_out == DataType.STRING:
                    ra = ev.evaluate(arg)
                    dict_out, sorted_out = ra.dictionary, ra.dict_sorted
                outs.append((data.reshape(1, 1),
                             validity.reshape(1, 1)
                             if validity is not None else None))
                metas.append((dt_out, dict_out, sorted_out))
            cell["meta"] = metas
            return ([o[0] for o in outs], [o[1] for o in outs])

        fn = jax.jit(shard_map(
            local, mesh=mesh.mesh, in_specs=(_PS, _PS, _PS),
            out_specs=(_PS, _PS), check_vma=False,
        ))
        return fn, cell

    (out_d, out_v), metas = run_dstage(sig, build, (datas, valids, rv))
    # every shard holds the identical reduced row; keep shard 0's copy
    # (built host-side: under multi-process, device_put of a host array
    # onto a cross-process sharding places only local shards)
    rv_np = np.zeros((mesh.n, 1), dtype=bool)
    rv_np[0, 0] = True
    rv_out = jax.device_put(rv_np, mesh.sharding(_PS))
    cols = [
        DColumn(d, v, m[0], m[1], m[2])
        for d, v, m in zip(out_d, out_v, metas)
    ]
    exprs = node.dependent + node.aggregates
    return DTable(list(exprs), cols, rv_out, mesh, 1.0)


def _grouped_aggregate(dt: DTable, node: L.AggregateNode) -> DTable:
    mesh = dt.mesh
    n = mesh.n
    rps = dt.rows_per_shard
    specs = _agg_specs(node)
    group_by = node.group_by
    bucket_cap = padded_size(max(LANE, 2 * rps // max(n, 1)), LANE)
    datas, valids, rv = flatten_dtable(dt)

    while True:
        sig = ("dagg_group", node.semantic_key(), bucket_cap,
               dtable_signature(dt))

        def build():
            cell = {}

            def local(datas, valids, rv):
                t, cm, d_f, v_f, rvf = _flat_cols(dt, datas, valids, rv)
                ev = ExpressionEvaluator(t, cm)
                rows = rvf.shape[0]
                # ---- group key columns (normalized data + validity)
                kds, kvs, kmetas = [], [], []
                for e in group_by:
                    r = ev.evaluate(e)
                    kv = (jnp.ones(rows, bool) if r.validity is None
                          else r.validity)
                    kd = jnp.where(kv, r.data, jnp.zeros((), r.data.dtype))
                    kds.append(kd)
                    kvs.append(kv)
                    kmetas.append((r.dtype, r.dictionary, r.dict_sorted,
                                   r.validity is not None))
                # ---- aggregate inputs
                agg_inputs = []
                for fn_, arg, _ in specs:
                    if arg is None:
                        agg_inputs.append((None, rvf))
                    else:
                        r = ev.evaluate(arg)
                        av = rvf if r.validity is None else (rvf & r.validity)
                        agg_inputs.append((r.data, av))
                # ---- local sorted pre-aggregation
                sort_keys = [(~rvf).astype(jnp.int32)]
                for kd, kv in zip(kds, kvs):
                    sort_keys.append(kv.astype(jnp.int32))
                    sort_keys.append(kd)
                payload = []
                for vals, av in agg_inputs:
                    if vals is not None:
                        payload.append(vals)
                    payload.append(av)
                operands = tuple(sort_keys) + tuple(payload)
                sorted_ops = jax.lax.sort(operands, num_keys=len(sort_keys))
                s_keys = sorted_ops[: len(sort_keys)]
                s_pay = list(sorted_ops[len(sort_keys):])
                s_rv = s_keys[0] == 0
                diff = jnp.zeros(rows, dtype=bool).at[0].set(True)
                for k in s_keys:
                    diff = diff | jnp.concatenate(
                        [jnp.ones(1, bool), k[1:] != k[:-1]])
                boundary = s_rv & diff
                seg = jnp.clip(
                    jnp.cumsum(boundary.astype(jnp.int32)) - 1, 0, rows - 1)
                part_lists = []
                k = 0
                for fn_, arg, _ in specs:
                    if arg is None:
                        av = s_pay[k]; k += 1
                        parts = _partials(fn_, None, av, seg, rows, s_rv)
                    else:
                        vals = s_pay[k]; av = s_pay[k + 1]; k += 2
                        parts = _partials(fn_, vals, av & s_rv, seg, rows,
                                          s_rv)
                    part_lists.append(parts)
                # representative rows: first row of each local group
                rep_valid = boundary
                # sorted group key cols per row
                s_kds = [s_keys[1 + 2 * i + 1] for i in range(len(group_by))]
                s_kvs = [s_keys[1 + 2 * i] != 0 for i in range(len(group_by))]
                # ---- shuffle reps by group-key hash
                h = jnp.full(rows, 1469598103934665603, dtype=jnp.uint64)
                prime = jnp.uint64(1099511628211)
                for kd, kv in zip(s_kds, s_kvs):
                    h = (h ^ kd.astype(jnp.uint64)) * prime
                    h = (h ^ kv.astype(jnp.uint64)) * prime
                route_pay = []
                for kd, kv in zip(s_kds, s_kvs):
                    route_pay.append(kd)
                    route_pay.append(kv)
                for parts, (fn_, arg, _) in zip(part_lists, specs):
                    for p in parts:
                        route_pay.append(jnp.take(p, seg))
                _, r_valid, r_pay, over = shf.shuffle_rows(
                    h.astype(jnp.int64), rep_valid, tuple(route_pay), n,
                    bucket_cap)
                recv = r_valid.shape[0]
                # ---- combine received partials (same machinery)
                k = 0
                r_kds, r_kvs = [], []
                for _ in group_by:
                    r_kds.append(r_pay[k]); k += 1
                    r_kvs.append(r_pay[k]); k += 1
                r_parts = []
                for parts in part_lists:
                    r_parts.append(tuple(
                        r_pay[k + i] for i in range(len(parts))))
                    k += len(parts)
                sort_keys2 = [(~r_valid).astype(jnp.int32)]
                for kd, kv in zip(r_kds, r_kvs):
                    sort_keys2.append(kv.astype(jnp.int32))
                    sort_keys2.append(kd)
                payload2 = []
                for parts in r_parts:
                    payload2.extend(parts)
                operands2 = tuple(sort_keys2) + tuple(payload2)
                sorted2 = jax.lax.sort(operands2, num_keys=len(sort_keys2))
                s2_keys = sorted2[: len(sort_keys2)]
                s2_pay = list(sorted2[len(sort_keys2):])
                s2_rv = s2_keys[0] == 0
                diff2 = jnp.zeros(recv, dtype=bool).at[0].set(True)
                for kk in s2_keys:
                    diff2 = diff2 | jnp.concatenate(
                        [jnp.ones(1, bool), kk[1:] != kk[:-1]])
                boundary2 = s2_rv & diff2
                seg2 = jnp.clip(
                    jnp.cumsum(boundary2.astype(jnp.int32)) - 1, 0, recv - 1)
                out_data, out_valid, metas = [], [], []
                # group key outputs
                for i, (e, meta) in enumerate(zip(group_by, kmetas)):
                    kd = s2_keys[1 + 2 * i + 1]
                    kv = s2_keys[1 + 2 * i] != 0
                    out_data.append(kd)
                    out_valid.append(kv if meta[3] else None)
                    metas.append((meta[0], meta[1], meta[2]))
                # aggregate outputs
                k = 0
                for parts0, (fn_, arg, expr) in zip(part_lists, specs):
                    parts = tuple(s2_pay[k + i] for i in range(len(parts0)))
                    k += len(parts0)
                    combined = _combine(fn_, parts, s2_rv, seg2, recv)
                    data, validity, dt_out = _finalize(fn_, combined, arg)
                    data = jnp.take(data, seg2)
                    if validity is not None:
                        validity = jnp.take(validity, seg2)
                    dict_out, sorted_out = None, True
                    if dt_out == DataType.STRING and arg is not None:
                        ra = ev.evaluate(arg)
                        dict_out, sorted_out = ra.dictionary, ra.dict_sorted
                    out_data.append(data)
                    out_valid.append(validity)
                    metas.append((dt_out, dict_out, sorted_out))
                cell["meta"] = metas
                return (
                    [d.reshape(1, -1) for d in out_data],
                    [v.reshape(1, -1) if v is not None else None
                     for v in out_valid],
                    boundary2.reshape(1, -1),
                    jax.lax.pmax(over, SHARD_AXIS).reshape(1),
                )

            fn = jax.jit(shard_map(
                local, mesh=mesh.mesh, in_specs=(_PS, _PS, _PS),
                out_specs=(_PS, _PS, _PS, _P1), check_vma=False,
            ))
            return fn, cell

        (out_d, out_v, rv_out, over), metas = run_dstage(
            sig, build, (datas, valids, rv))
        if sync_scalar_int(over) == 0:
            break
        STATS["shuffle_retries"] += 1
        bucket_cap *= 2
        if bucket_cap > MAX_BUCKET_CAP:
            raise DistributedUnsupported("aggregate exceeds retry capacity")

    cols = [
        DColumn(d, v, m[0], m[1], m[2])
        for d, v, m in zip(out_d, out_v, metas)
    ]
    exprs = list(node.group_by) + node.dependent + list(node.aggregates)
    return DTable(exprs, cols, rv_out, mesh, None)

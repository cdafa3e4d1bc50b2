"""Group-by aggregation operator (sort-based; ref:
operators/aggregate_hash.hpp:137 / aggregate_sort.hpp:61 — one fused device
sort + segment reductions instead of hash tables, see kernels/aggregates.py).

Two compiled stages with a single host sync between them:
  stage 1: evaluate keys/args, fused lexicographic sort, segment ids,
           group count                       -> sync num_groups -> out_cap
  stage 2: segment reductions + representative-row gathers at the static
           output capacity.

Supports min/max/sum/avg/count/count(*)/count-distinct/sum-distinct/
avg-distinct/stddev_samp/any with SQL null semantics; DISTINCT aggregates
run one extra fine-grained (keys + value) grouping pass inside stage 2.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.expression import ast
from hyrise_tpu.kernels import aggregates as aggk
from hyrise_tpu.kernels import joins as joink
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.operators.joins import _SYNC_SKIP_CAP
from hyrise_tpu.operators.compiled import (
    run_arrays,
    run_stage,
    used_column_indices as _used_cols,
)
from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import (
    AggregateFunction,
    DataType,
    physical_dtype,
    size_bucket,
)

_POS_SENTINEL = np.iinfo(np.int64).max


class Aggregate(AbstractReadOnlyOperator):
    def __init__(self, in_op, group_by: Sequence[ast.Expression],
                 aggregates: Sequence[ast.AggregateExpression],
                 dependent: Sequence[ast.Expression] = ()):
        super().__init__(in_op)
        self.group_by = list(group_by)
        self.aggregates = list(aggregates)
        # key-determined columns output via representative rows (see
        # DependentGroupByReduction rule)
        self.dependent = list(dependent)
        self.output_expressions = (
            self.group_by + self.dependent + self.aggregates
        )

    DENSE_DOMAIN_LIMIT = 1 << 21

    def _dense_domains(self, table, cmap):
        """Static per-key domains when every group key maps onto a small
        dense integer range: dictionary codes, or int/date base columns
        with known min/max statistics.  Grouping then becomes direct slot
        arithmetic — no sort, no host sync (the dense-hash fast path of the
        reference's AggregateHash, aggregate_hash.cpp:406-417, taken
        further).  Returns a list of ('dict'|'int', offset, size) specs."""
        if not self.group_by:
            return None
        from hyrise_tpu.statistics.cardinality import CardinalityEstimator

        est = None
        specs = []
        for e in self.group_by:
            idx = cmap.get(e.key())
            if idx is None:
                return None
            col = table.columns[idx]
            nullable = col.validity is not None
            if col.data_type == DataType.STRING and col.dictionary is not None:
                specs.append(("dict", 0, len(col.dictionary) + (1 if nullable else 0)))
                continue
            if col.data_type in (DataType.INT, DataType.DATE, DataType.LONG):
                if est is None:
                    est = CardinalityEstimator()
                # fresh-only: stale bounds would clip appended out-of-range
                # keys into the top slot, silently merging distinct groups
                cs = est.column_stats_fresh(e)
                if cs is None or cs.min_value is None:
                    return None
                lo = int(cs.min_value)
                size = int(cs.max_value) - lo + 1 + (1 if nullable else 0)
                if size <= 0 or size > self.DENSE_DOMAIN_LIMIT:
                    return None
                specs.append(("int", lo, size))
                continue
            return None
        prod = 1
        for _, _, size in specs:
            prod *= max(size, 1)
        if not (0 < prod <= self.DENSE_DOMAIN_LIMIT):
            return None
        return specs

    def _on_execute(self) -> Table:
        table = self.input_table_left()
        cmap = self._column_map(self._left)
        cacheable = not self.uncorrelated_subquery_plans

        args_exprs = [a.argument for a in self.aggregates if a.argument is not None]
        # deduplicate argument expressions
        seen = {}
        for e in args_exprs:
            seen.setdefault(e.key(), e)
        arg_list = list(seen.values())
        arg_pos = {k: i for i, k in enumerate(seen.keys())}

        dense_domains = self._dense_domains(table, cmap)
        needs_distinct_sort = any(
            a.distinct or a.function == AggregateFunction.COUNT_DISTINCT
            for a in self.aggregates
        )
        if (self.group_by and dense_domains is None) or needs_distinct_sort:
            # only the sorted paths benefit from compaction; global and
            # dense-slot aggregation are sort-free and sync-free
            table = self.maybe_compact(
                table, est_rows=self.input_estimated_rows()
            )
            dense_domains = self._dense_domains(table, cmap)

        # ---------------- stage 1: keys, args, sort, segment ids ----------
        def build1(t: Table):
            ev = self.make_evaluator(t, cmap)
            n_mask = t.row_mask()
            key_results = [ev.evaluate(e) for e in self.group_by]
            key_data = tuple(joink.normalize_key(r.data) for r in key_results)
            key_valid = tuple(
                r.validity if r.validity is not None
                else jnp.ones(t.capacity, bool)
                for r in key_results
            )
            if dense_domains is not None:
                # dense slot = mixed-radix code over the key domains;
                # NULLs take the extra top slot per key — no sort, and the
                # output capacity is known statically (no host sync)
                perm = jnp.arange(t.capacity, dtype=jnp.int32)
                seg_ids = jnp.zeros(t.capacity, dtype=jnp.int64)
                for r, (kind, offset, domain) in zip(key_results, dense_domains):
                    code = r.data.astype(jnp.int64) - offset
                    if r.validity is not None:
                        code = jnp.where(r.validity, code, domain - 1)
                    seg_ids = seg_ids * domain + jnp.clip(code, 0, domain - 1)
                num_groups = jnp.int64(0)  # unused on the dense path
            elif self.group_by:
                perm, seg_ids, num_groups = aggk.group_rows(
                    key_data, key_valid, n_mask
                )
            else:
                perm = jnp.arange(t.capacity, dtype=jnp.int32)
                seg_ids = jnp.where(n_mask, 0, 1).astype(jnp.int64)
                num_groups = jnp.int64(1)
            dep_results = [ev.evaluate(e) for e in self.dependent]
            arg_results = [ev.evaluate(e) for e in arg_list]
            dep_arrays = [
                (r.data if r.data.dtype != jnp.bool_ else r.data.astype(jnp.int32),
                 r.validity)
                for r in dep_results
            ]
            key_arrays = [
                (r.data if r.data.dtype != jnp.bool_ else r.data.astype(jnp.int32),
                 r.validity)
                for r in key_results
            ]
            arg_arrays = [
                (r.data if r.data.dtype != jnp.bool_ else r.data.astype(jnp.int32),
                 r.validity)
                for r in arg_results
            ]
            meta = (
                [(r.dtype, r.dictionary, r.dict_sorted) for r in key_results],
                [(r.dtype, r.dictionary, r.dict_sorted) for r in arg_results],
                [(r.dtype, r.dictionary, r.dict_sorted) for r in dep_results],
            )
            return (perm, seg_ids, num_groups, n_mask, key_arrays,
                    arg_arrays, dep_arrays), meta

        (perm, seg_ids, num_groups_dev, n_mask, key_arrays, arg_arrays,
         dep_arrays), meta = run_stage(
            "agg1", table, build1,
            extra_key=(
                tuple(e.key() for e in self.group_by),
                tuple(e.key() for e in self.dependent),
                tuple(k for k in seen.keys()),
                _referenced_pk(
                    self.parameters,
                    list(self.group_by) + list(self.dependent)
                    + [a for a in self.aggregates],
                ),
                tuple(dense_domains) if dense_domains else None,
            ),
            cacheable=cacheable,
            used_cols=_used_cols(
                cmap, list(self.group_by) + list(self.dependent) + arg_list
            ),
        )
        key_meta, arg_meta, dep_meta = meta
        from hyrise_tpu.operators.base import _sync_is_expensive

        if dense_domains is not None:
            num_groups = 1
            for _, _, size in dense_domains:
                num_groups *= size
            out_cap = size_bucket(num_groups)
        elif self.group_by and _sync_is_expensive() \
                and table.capacity <= _SYNC_SKIP_CAP:
            # defer the group-count sync (a tunnel RTT): groups <= rows, so
            # reductions run at input capacity and empty tail slots hide
            # behind a selection mask exactly like the dense path.  Above
            # _SYNC_SKIP_CAP the padded reductions and representative-row
            # gathers cost multiples of the RTT (Q20's 2-key aggregate at
            # 8M capacity spent 2.2 s where 512k slots suffice) — sync.
            num_groups = None
            out_cap = size_bucket(table.capacity)
        else:
            num_groups = int(num_groups_dev) if self.group_by else 1
            out_cap = size_bucket(num_groups)

        # ---------------- stage 2: reductions at static out_cap -----------
        agg_spec = tuple(
            (a.function, a.distinct,
             arg_pos[a.argument.key()] if a.argument is not None else -1)
            for a in self.aggregates
        )

        # rows arrive sorted by segment id on the group_rows path: segment
        # totals become cumsum diffs at run bounds (linear passes) instead
        # of scatter-adds, which XLA:TPU serializes per colliding index
        segs_sorted = bool(self.group_by) and dense_domains is None

        def _seg_count(seg_c, valid):
            if segs_sorted:
                return aggk.segment_count_sorted(seg_c, valid,
                                                 num_segments=out_cap)
            return aggk.segment_count(seg_c, valid, num_segments=out_cap)

        def _seg_sum(vals, seg_c, valid):
            if segs_sorted:
                return aggk.segment_sum_sorted(vals, seg_c, valid,
                                               num_segments=out_cap)
            return aggk.segment_sum(vals, seg_c, valid, num_segments=out_cap)

        def _seg_min(vals, seg_c, valid):
            if segs_sorted:
                return aggk.segment_min_sorted(vals, seg_c, valid,
                                               num_segments=out_cap)
            return aggk.segment_min(vals, seg_c, valid, num_segments=out_cap)

        def _seg_max(vals, seg_c, valid):
            if segs_sorted:
                return aggk.segment_max_sorted(vals, seg_c, valid,
                                               num_segments=out_cap)
            return aggk.segment_max(vals, seg_c, valid, num_segments=out_cap)

        def _seg_sum_sq(vals, seg_c, valid):
            if segs_sorted:
                return aggk.segment_sum_sq_sorted(vals, seg_c, valid,
                                                  num_segments=out_cap)
            return aggk.segment_sum_sq(vals, seg_c, valid, num_segments=out_cap)

        def build2(perm, seg_ids, n_mask, key_arrays, arg_arrays, dep_arrays):
            cap = perm.shape[0]
            sorted_real = jnp.take(n_mask, perm)
            seg_c = jnp.where(sorted_real, seg_ids, out_cap)
            # per-original-row group id (for distinct passes + dense path)
            seg_orig = jnp.full(cap, out_cap, dtype=jnp.int64).at[perm].set(
                seg_c, unique_indices=True)  # perm is a permutation
            out_arrays = []
            occupied = _seg_count(seg_c, sorted_real)
            out_arrays.append((occupied, None))
            rep_rows = None
            if self.group_by:
                if segs_sorted:
                    first_pos = aggk.segment_first_sorted(
                        seg_c, num_segments=out_cap
                    )
                else:
                    pos = jnp.arange(cap, dtype=jnp.int64)
                    first_pos = jax.ops.segment_min(
                        jnp.where(sorted_real, pos, _POS_SENTINEL),
                        seg_c, num_segments=out_cap,
                    )
                    first_pos = jnp.clip(first_pos, 0, cap - 1)
                rep_rows = jnp.take(perm, first_pos)
                for (data, valid) in key_arrays + dep_arrays:
                    kd = jnp.take(data, rep_rows)
                    kv = jnp.take(valid, rep_rows) if valid is not None else None
                    out_arrays.append((kd, kv))
            for (fn, distinct, argi) in agg_spec:
                if argi < 0:
                    counts = _seg_count(seg_c, sorted_real)
                    out_arrays.append((counts.astype(jnp.int64), None))
                    continue
                data, valid = arg_arrays[argi]
                valid = valid if valid is not None else jnp.ones(cap, bool)
                if distinct or fn == AggregateFunction.COUNT_DISTINCT:
                    out_arrays.append(
                        _distinct_agg(fn, data, valid, seg_orig, n_mask,
                                      out_cap)
                    )
                    continue
                sv = jnp.take(data, perm)
                svalid = jnp.take(valid, perm) & sorted_real
                counts = _seg_count(seg_c, svalid)
                nonempty = counts > 0
                if fn == AggregateFunction.COUNT:
                    out_arrays.append((counts.astype(jnp.int64), None))
                elif fn == AggregateFunction.SUM:
                    sums = _seg_sum(sv, seg_c, svalid)
                    out_arrays.append((sums, nonempty))
                elif fn == AggregateFunction.AVG:
                    sums = _seg_sum(sv.astype(jnp.float64), seg_c, svalid)
                    out_arrays.append(
                        (sums / jnp.maximum(counts, 1), nonempty)
                    )
                elif fn in (AggregateFunction.MIN, AggregateFunction.ANY):
                    vals = _seg_min(sv, seg_c, svalid)
                    out_arrays.append((jnp.where(nonempty, vals, 0), nonempty))
                elif fn == AggregateFunction.MAX:
                    vals = _seg_max(sv, seg_c, svalid)
                    out_arrays.append((jnp.where(nonempty, vals, 0), nonempty))
                elif fn == AggregateFunction.STDDEV_SAMP:
                    sums = _seg_sum(sv.astype(jnp.float64), seg_c, svalid)
                    sumsq = _seg_sum_sq(sv, seg_c, svalid)
                    n = counts.astype(jnp.float64)
                    var = (sumsq - sums * sums / jnp.maximum(n, 1)) / jnp.maximum(
                        n - 1, 1
                    )
                    out_arrays.append((jnp.sqrt(jnp.maximum(var, 0.0)),
                                       counts > 1))
                else:
                    raise NotImplementedError(f"aggregate {fn}")
            return out_arrays, None

        out_arrays, _ = run_arrays(
            "agg2", build2,
            (perm, seg_ids, n_mask, key_arrays, arg_arrays, dep_arrays),
            extra_key=(agg_spec, out_cap, bool(self.group_by), segs_sorted,
                       tuple(e.key() for e in self.group_by),
                       tuple(e.key() for e in self.dependent)),
            cacheable=cacheable,
        )

        # ---------------- assemble output table ---------------------------
        names: List[str] = []
        columns: List[Column] = []
        occupied, _ = out_arrays[0]
        out_arrays = out_arrays[1:]
        i = 0
        if self.group_by:
            for expr, (dtype, dictionary, ds) in zip(
                self.group_by + self.dependent, key_meta + dep_meta
            ):
                data, valid = out_arrays[i]
                i += 1
                names.append(expr.name())
                columns.append(Column(dtype, data, valid, dictionary, ds))
        for agg in self.aggregates:
            data, valid = out_arrays[i]
            i += 1
            names.append(agg.name())
            dt = agg.data_type()
            dictionary = None
            ds = True
            if agg.function in (AggregateFunction.MIN, AggregateFunction.MAX,
                                AggregateFunction.ANY) and agg.argument is not None:
                adt, adict, ads = arg_meta[arg_pos[agg.argument.key()]]
                if adt == DataType.STRING:
                    dt, dictionary, ds = adt, adict, ads
            columns.append(
                Column(dt, data.astype(physical_dtype(dt)), valid, dictionary, ds)
            )
        out = Table(names, columns,
                    num_groups if num_groups is not None else out_cap)
        if dense_domains is not None or num_groups is None:
            # slots include empty groups — hide them via selection
            out.selection = occupied[: out.capacity] > 0
        return out

    def _describe_self(self) -> str:
        g = ", ".join(e.description() for e in self.group_by)
        a = ", ".join(e.description() for e in self.aggregates)
        return f"Aggregate(group_by=[{g}], aggregates=[{a}])"


def _pk(parameters) -> tuple:
    return tuple(sorted(parameters.items())) if parameters else ()


def _referenced_pk(parameters, exprs) -> tuple:
    """Key material only for parameters the expressions actually reference —
    unreferenced bindings (they belong to scans below) must not fragment the
    stage cache across prepared-statement executions."""
    if not parameters:
        return ()
    pids = {
        sub.parameter_id
        for e in exprs
        for sub in e.walk()
        if isinstance(sub, ast.Parameter)
    }
    return tuple((k, v) for k, v in sorted(parameters.items()) if k in pids)


def _distinct_agg(fn, data, valid, seg_orig, n_mask, out_cap):
    """COUNT/SUM/AVG(DISTINCT x): fine grouping over (group id, x), then
    reduce one representative per fine group into the coarse groups.
    `seg_orig` carries each original row's coarse group id (works for both
    sorted and dense grouping paths)."""
    cap = data.shape[0]
    fine_key = joink.normalize_key(data)
    fkd = (seg_orig, fine_key)
    fkv = (jnp.ones(cap, bool), valid)
    perm2, fine_seg, _ = aggk.group_rows(fkd, fkv, n_mask)
    sorted_real = jnp.take(n_mask, perm2)
    coarse_seg = jnp.where(sorted_real, jnp.take(seg_orig, perm2), out_cap)
    diff_f = jnp.concatenate(
        [jnp.ones(1, dtype=bool), fine_seg[1:] != fine_seg[:-1]]
    )
    arg_valid_sorted = jnp.take(valid, perm2) & sorted_real
    is_rep = diff_f & arg_valid_sorted
    counts = jax.ops.segment_sum(
        is_rep.astype(jnp.int64), coarse_seg, num_segments=out_cap
    )
    if fn == AggregateFunction.COUNT_DISTINCT or fn == AggregateFunction.COUNT:
        return counts, None
    sv = jnp.take(data, perm2)
    acc_dtype = (
        jnp.float64 if jnp.issubdtype(sv.dtype, jnp.floating) else jnp.int64
    )
    acc = jnp.where(is_rep, sv.astype(acc_dtype), 0)
    sums = jax.ops.segment_sum(acc, coarse_seg, num_segments=out_cap)
    if fn == AggregateFunction.SUM:
        return sums, counts > 0
    if fn == AggregateFunction.AVG:
        return sums.astype(jnp.float64) / jnp.maximum(counts, 1), counts > 0
    raise NotImplementedError(f"DISTINCT {fn}")

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
from hyrise_tpu.operators.compiled import run_arrays, run_stage
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
                 aggregates: Sequence[ast.AggregateExpression]):
        super().__init__(in_op)
        self.group_by = list(group_by)
        self.aggregates = list(aggregates)
        self.output_expressions = self.group_by + self.aggregates

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
            if self.group_by:
                perm, seg_ids, num_groups = aggk.group_rows(
                    key_data, key_valid, n_mask
                )
            else:
                perm = jnp.arange(t.capacity, dtype=jnp.int32)
                seg_ids = jnp.where(n_mask, 0, 1).astype(jnp.int64)
                num_groups = jnp.int64(1)
            arg_results = [ev.evaluate(e) for e in arg_list]
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
            )
            return (perm, seg_ids, num_groups, n_mask, key_arrays, arg_arrays), meta

        (perm, seg_ids, num_groups_dev, n_mask, key_arrays, arg_arrays), meta = \
            run_stage(
                "agg1", table, build1,
                extra_key=(
                    tuple(e.key() for e in self.group_by),
                    tuple(k for k in seen.keys()),
                    _pk(self.parameters),
                ),
                cacheable=cacheable,
            )
        key_meta, arg_meta = meta
        num_groups = int(num_groups_dev) if self.group_by else 1
        out_cap = size_bucket(num_groups)

        # ---------------- stage 2: reductions at static out_cap -----------
        agg_spec = tuple(
            (a.function, a.distinct,
             arg_pos[a.argument.key()] if a.argument is not None else -1)
            for a in self.aggregates
        )

        def build2(perm, seg_ids, n_mask, key_arrays, arg_arrays):
            cap = perm.shape[0]
            sorted_real = jnp.take(n_mask, perm)
            seg_c = jnp.where(sorted_real, seg_ids, out_cap)
            out_arrays = []
            rep_rows = None
            if self.group_by:
                pos = jnp.arange(cap, dtype=jnp.int64)
                first_pos = jax.ops.segment_min(
                    jnp.where(sorted_real, pos, _POS_SENTINEL),
                    seg_c, num_segments=out_cap,
                )
                first_pos = jnp.clip(first_pos, 0, cap - 1)
                rep_rows = jnp.take(perm, first_pos)
                for (data, valid) in key_arrays:
                    kd = jnp.take(data, rep_rows)
                    kv = jnp.take(valid, rep_rows) if valid is not None else None
                    out_arrays.append((kd, kv))
            for (fn, distinct, argi) in agg_spec:
                if argi < 0:
                    counts = aggk.segment_count(seg_c, sorted_real,
                                                num_segments=out_cap)
                    out_arrays.append((counts.astype(jnp.int64), None))
                    continue
                data, valid = arg_arrays[argi]
                valid = valid if valid is not None else jnp.ones(cap, bool)
                if distinct or fn == AggregateFunction.COUNT_DISTINCT:
                    out_arrays.append(
                        _distinct_agg(fn, data, valid, key_arrays, n_mask,
                                      out_cap)
                    )
                    continue
                sv = jnp.take(data, perm)
                svalid = jnp.take(valid, perm) & sorted_real
                counts = aggk.segment_count(seg_c, svalid, num_segments=out_cap)
                nonempty = counts > 0
                if fn == AggregateFunction.COUNT:
                    out_arrays.append((counts.astype(jnp.int64), None))
                elif fn == AggregateFunction.SUM:
                    sums = aggk.segment_sum(sv, seg_c, svalid, num_segments=out_cap)
                    out_arrays.append((sums, nonempty))
                elif fn == AggregateFunction.AVG:
                    sums = aggk.segment_sum(
                        sv.astype(jnp.float64), seg_c, svalid,
                        num_segments=out_cap,
                    )
                    out_arrays.append(
                        (sums / jnp.maximum(counts, 1), nonempty)
                    )
                elif fn in (AggregateFunction.MIN, AggregateFunction.ANY):
                    vals = aggk.segment_min(sv, seg_c, svalid, num_segments=out_cap)
                    out_arrays.append((jnp.where(nonempty, vals, 0), nonempty))
                elif fn == AggregateFunction.MAX:
                    vals = aggk.segment_max(sv, seg_c, svalid, num_segments=out_cap)
                    out_arrays.append((jnp.where(nonempty, vals, 0), nonempty))
                elif fn == AggregateFunction.STDDEV_SAMP:
                    sums = aggk.segment_sum(
                        sv.astype(jnp.float64), seg_c, svalid,
                        num_segments=out_cap,
                    )
                    sumsq = aggk.segment_sum_sq(sv, seg_c, svalid,
                                                num_segments=out_cap)
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
            "agg2", build2, (perm, seg_ids, n_mask, key_arrays, arg_arrays),
            extra_key=(agg_spec, out_cap, bool(self.group_by),
                       tuple(e.key() for e in self.group_by)),
            cacheable=cacheable,
        )

        # ---------------- assemble output table ---------------------------
        names: List[str] = []
        columns: List[Column] = []
        i = 0
        if self.group_by:
            for expr, (dtype, dictionary, ds) in zip(self.group_by, key_meta):
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
        return Table(names, columns, num_groups)

    def _describe_self(self) -> str:
        g = ", ".join(e.description() for e in self.group_by)
        a = ", ".join(e.description() for e in self.aggregates)
        return f"Aggregate(group_by=[{g}], aggregates=[{a}])"


def _pk(parameters) -> tuple:
    return tuple(sorted(parameters.items())) if parameters else ()


def _distinct_agg(fn, data, valid, key_arrays, n_mask, out_cap):
    """COUNT/SUM/AVG(DISTINCT x): fine grouping over (group keys, x), then
    reduce one representative per fine group into the coarse groups."""
    cap = data.shape[0]
    fine_key = joink.normalize_key(data)
    key_data = tuple(joink.normalize_key(d) for d, _ in key_arrays)
    key_valid = tuple(
        v if v is not None else jnp.ones(cap, bool) for _, v in key_arrays
    )
    fkd = key_data + (fine_key,)
    fkv = key_valid + (valid,)
    perm2, fine_seg, _ = aggk.group_rows(fkd, fkv, n_mask)
    sorted_real = jnp.take(n_mask, perm2)
    # coarse boundary: any coarse key differs from previous sorted row
    diff_c = jnp.zeros(cap, dtype=bool).at[0].set(True)
    for d, v in zip(key_data, key_valid):
        colv = jnp.take(jnp.where(v, d, jnp.int64(0)), perm2)
        coln = jnp.take(~v, perm2)
        diff_c = diff_c | jnp.concatenate(
            [jnp.ones(1, dtype=bool), colv[1:] != colv[:-1]]
        )
        diff_c = diff_c | jnp.concatenate(
            [jnp.ones(1, dtype=bool), coln[1:] != coln[:-1]]
        )
    coarse_seg = jnp.cumsum(diff_c.astype(jnp.int64)) - 1
    coarse_seg = jnp.where(sorted_real, coarse_seg, out_cap)
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

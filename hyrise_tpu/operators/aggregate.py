"""Group-by aggregation operator (sort-based; ref:
operators/aggregate_hash.hpp:137 / aggregate_sort.hpp:61 — we use one fused
device sort + segment reductions instead of hash tables, see
kernels/aggregates.py).

Supports min/max/sum/avg/count/count(*)/count-distinct/sum-distinct/
stddev_samp/any with SQL null semantics; DISTINCT aggregates run one extra
fine-grained (keys + value) grouping pass.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.expression import ast
from hyrise_tpu.expression.evaluator import ExprResult
from hyrise_tpu.kernels import aggregates as aggk
from hyrise_tpu.kernels import joins as joink
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
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
        ev = self.make_evaluator(table, cmap)
        cap = table.capacity
        n_mask = table.row_mask()

        group_results: List[ExprResult] = [ev.evaluate(e) for e in self.group_by]
        key_data = tuple(joink.normalize_key(r.data) for r in group_results)
        key_valid = tuple(
            r.validity if r.validity is not None else jnp.ones(cap, bool)
            for r in group_results
        )

        if self.group_by:
            perm, seg_ids, num_groups_dev = aggk.group_rows(key_data, key_valid, n_mask)
            num_groups = int(num_groups_dev)
        else:
            perm = jnp.arange(cap, dtype=jnp.int32)
            seg_ids = jnp.where(n_mask, 0, 1).astype(jnp.int64)
            num_groups = 1  # global aggregate: always one output row

        out_cap = size_bucket(num_groups)
        sorted_real = jnp.take(n_mask, perm)
        seg_ids_c = jnp.where(sorted_real, seg_ids, out_cap)  # drop padding

        names: List[str] = []
        columns: List[Column] = []

        # ----- group key columns: first original row of each segment
        if self.group_by:
            pos = jnp.arange(cap, dtype=jnp.int64)
            first_pos = jax.ops.segment_min(
                jnp.where(sorted_real, pos, _POS_SENTINEL),
                seg_ids_c,
                num_segments=out_cap,
            )
            first_pos = jnp.clip(first_pos, 0, cap - 1)
            rep_rows = jnp.take(perm, first_pos)
            for expr, res in zip(self.group_by, group_results):
                col = res.to_column().take(rep_rows)
                names.append(expr.name())
                columns.append(col)

        # ----- aggregates
        for agg in self.aggregates:
            col = self._compute_aggregate(
                agg, ev, table, perm, seg_ids_c, sorted_real, out_cap,
                key_data, key_valid, n_mask,
            )
            names.append(agg.name())
            columns.append(col)

        out = Table(names, columns, num_groups)
        return out

    # ------------------------------------------------------------------

    def _compute_aggregate(self, agg, ev, table, perm, seg_ids, sorted_real,
                           out_cap, key_data, key_valid, n_mask) -> Column:
        f = agg.function
        if f == AggregateFunction.COUNT and agg.argument is None:
            counts = aggk.segment_count(seg_ids, sorted_real, num_segments=out_cap)
            return Column(DataType.LONG, counts.astype(jnp.int64))

        res = ev.evaluate(agg.argument)
        valid = (
            res.validity if res.validity is not None
            else jnp.ones(table.capacity, bool)
        )
        sv = jnp.take(res.data, perm)
        svalid = jnp.take(valid, perm) & sorted_real

        if agg.distinct or f == AggregateFunction.COUNT_DISTINCT:
            return self._distinct_aggregate(
                agg, res, valid, out_cap, key_data, key_valid, n_mask
            )

        counts = aggk.segment_count(seg_ids, svalid, num_segments=out_cap)
        nonempty = counts > 0

        if f == AggregateFunction.COUNT:
            return Column(DataType.LONG, counts.astype(jnp.int64))
        if f == AggregateFunction.SUM:
            sums = aggk.segment_sum(sv, seg_ids, svalid, num_segments=out_cap)
            dt = agg.data_type()
            return Column(dt, sums.astype(physical_dtype(dt)), validity=nonempty)
        if f == AggregateFunction.AVG:
            sums = aggk.segment_sum(
                sv.astype(jnp.float64), seg_ids, svalid, num_segments=out_cap
            )
            avg = sums / jnp.maximum(counts, 1)
            return Column(DataType.DOUBLE, avg, validity=nonempty)
        if f in (AggregateFunction.MIN, AggregateFunction.MAX, AggregateFunction.ANY):
            if res.dtype == DataType.STRING:
                assert res.dict_sorted, "min/max needs a sorted dictionary"
            kernel = (
                aggk.segment_min
                if f in (AggregateFunction.MIN, AggregateFunction.ANY)
                else aggk.segment_max
            )
            vals = kernel(sv, seg_ids, svalid, num_segments=out_cap)
            vals = jnp.where(nonempty, vals, 0)
            return Column(res.dtype, vals, validity=nonempty,
                          dictionary=res.dictionary, dict_sorted=res.dict_sorted)
        if f == AggregateFunction.STDDEV_SAMP:
            sums = aggk.segment_sum(
                sv.astype(jnp.float64), seg_ids, svalid, num_segments=out_cap
            )
            sumsq = aggk.segment_sum_sq(sv, seg_ids, svalid, num_segments=out_cap)
            n = counts.astype(jnp.float64)
            var = (sumsq - sums * sums / jnp.maximum(n, 1)) / jnp.maximum(n - 1, 1)
            var = jnp.maximum(var, 0.0)
            return Column(
                DataType.DOUBLE, jnp.sqrt(var), validity=counts > 1
            )
        raise NotImplementedError(f"aggregate {f}")

    def _distinct_aggregate(self, agg, res, valid, out_cap,
                            key_data, key_valid, n_mask) -> Column:
        """COUNT/SUM(DISTINCT x): fine grouping over (group keys, x), then
        reduce one representative per fine group into the coarse groups."""
        fine_key = joink.normalize_key(res.data)
        fkd = key_data + (fine_key,)
        fkv = key_valid + (valid,)
        perm2, fine_seg, _ = aggk.group_rows(fkd, fkv, n_mask)
        cap = res.data.shape[0]
        sorted_real = jnp.take(n_mask, perm2)
        # coarse boundary: any coarse key differs from previous sorted row
        coarse_ops = []
        for d, v in zip(key_data, key_valid):
            coarse_ops.append(jnp.take(jnp.where(v, d, jnp.int64(0)), perm2))
            coarse_ops.append(jnp.take(~v, perm2))
        diff_c = jnp.zeros(cap, dtype=bool).at[0].set(True)
        for colv in coarse_ops:
            diff_c = diff_c | jnp.concatenate(
                [jnp.ones(1, dtype=bool), colv[1:] != colv[:-1]]
            )
        if not coarse_ops:  # global aggregate
            diff_c = jnp.zeros(cap, dtype=bool).at[0].set(True)
        coarse_seg = jnp.cumsum(diff_c.astype(jnp.int64)) - 1
        coarse_seg = jnp.where(sorted_real, coarse_seg, out_cap)
        # fine-group start flags
        diff_f = jnp.concatenate(
            [jnp.ones(1, dtype=bool), fine_seg[1:] != fine_seg[:-1]]
        )
        arg_valid_sorted = jnp.take(valid, perm2) & sorted_real
        is_rep = diff_f & arg_valid_sorted
        if agg.function == AggregateFunction.COUNT_DISTINCT:
            counts = jax.ops.segment_sum(
                is_rep.astype(jnp.int64), coarse_seg, num_segments=out_cap
            )
            return Column(DataType.LONG, counts)
        if agg.function == AggregateFunction.SUM:
            sv = jnp.take(res.data, perm2)
            acc = jnp.where(is_rep, sv.astype(jnp.float64)
                            if jnp.issubdtype(sv.dtype, jnp.floating)
                            else sv.astype(jnp.int64), 0)
            sums = jax.ops.segment_sum(acc, coarse_seg, num_segments=out_cap)
            counts = jax.ops.segment_sum(
                is_rep.astype(jnp.int64), coarse_seg, num_segments=out_cap
            )
            dt = agg.data_type()
            return Column(dt, sums.astype(physical_dtype(dt)),
                          validity=counts > 0)
        if agg.function == AggregateFunction.AVG:
            sv = jnp.take(res.data, perm2)
            acc = jnp.where(is_rep, sv.astype(jnp.float64), 0.0)
            sums = jax.ops.segment_sum(acc, coarse_seg, num_segments=out_cap)
            counts = jax.ops.segment_sum(
                is_rep.astype(jnp.int64), coarse_seg, num_segments=out_cap
            )
            return Column(DataType.DOUBLE, sums / jnp.maximum(counts, 1),
                          validity=counts > 0)
        raise NotImplementedError(f"DISTINCT {agg.function}")

    def _describe_self(self) -> str:
        g = ", ".join(e.description() for e in self.group_by)
        a = ", ".join(e.description() for e in self.aggregates)
        return f"Aggregate(group_by=[{g}], aggregates=[{a}])"

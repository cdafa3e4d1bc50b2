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
    # above this many dense slots, colliding segment scatters serialize
    # on TPU — reroute to the slot-id sort path (still sync-free)
    DENSE_DIRECT_MAX = 1024

    # sorted-input dense domains could exceed DENSE_DOMAIN_LIMIT (no sort
    # is paid), but the slot-array output capacity rides into every
    # downstream operator: SF1 Q18 measured the 8M-slot variant costing
    # the consuming semi join +700 ms — more than the skipped 6M-row sort
    # saved.  Keep presorted within the dense envelope: it then purely
    # removes the lax.sort from shapes that were already dense-sorted.
    PRESORTED_DOMAIN_LIMIT = DENSE_DOMAIN_LIMIT

    def _presorted_key(self, table, cmap) -> bool:
        """True when the single group-by key is a base column the table is
        already physically ordered by (Table.sorted_by, set by bulk loads
        and Sort/scan propagation).  Only CONTIGUITY of equal keys matters
        for the linear reduction passes, so any sort direction qualifies;
        nullable keys are excluded (NULL rows would break run contiguity
        under the top-slot convention)."""
        if len(self.group_by) != 1 or not table.sorted_by:
            return False
        idx = cmap.get(self.group_by[0].key())
        if idx is None:
            return False
        if table.columns[idx].validity is not None:
            return False
        return table.column_names[idx] == table.sorted_by[0][0]

    def _dense_domains(self, table, cmap, limit=None):
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
                specs.append(("dict", 0,
                              len(col.dictionary) + (1 if nullable else 0),
                              nullable))
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
                if size <= 0 or size > (limit or self.DENSE_DOMAIN_LIMIT):
                    return None
                specs.append(("int", lo, size, nullable))
                continue
            return None
        prod = 1
        for _, _, size, _ in specs:
            prod *= max(size, 1)
        if not (0 < prod <= (limit or self.DENSE_DOMAIN_LIMIT)):
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

        def _dense_prod(specs):
            if specs is None:
                return None
            prod = 1
            for _, _, size, _ in specs:
                prod *= max(size, 1)
            return prod

        # physically-ordered single-key input: the dense-sorted machinery
        # can skip its lax.sort entirely, so a much larger slot domain pays
        presorted = self._presorted_key(table, cmap)
        _limit = self.PRESORTED_DOMAIN_LIMIT if presorted else None
        dense_domains = self._dense_domains(table, cmap, limit=_limit)
        needs_distinct_sort = any(
            a.distinct or a.function == AggregateFunction.COUNT_DISTINCT
            for a in self.aggregates
        )
        sort_based = self.group_by and (
            dense_domains is None
            or _dense_prod(dense_domains) > self.DENSE_DIRECT_MAX
        )
        if sort_based or needs_distinct_sort:
            # the sort-based paths benefit from compaction; global and
            # small-domain dense-slot aggregation are sort-free (compaction
            # keeps row order, so `presorted` stays valid)
            table = self.maybe_compact(
                table, est_rows=self.input_estimated_rows()
            )
            dense_domains = self._dense_domains(table, cmap, limit=_limit)

        dense_prod = _dense_prod(dense_domains)
        # small dense domains: XLA lowers low-slot-count segment ops
        # efficiently — keep the sort-free direct path (Q1's 8 slots run
        # ~2 ms at SF1).  LARGE dense domains pay colliding scatters that
        # XLA:TPU serializes per duplicate (Q17's 200k-slot AVG over 6M
        # rows measured 2.2 s) — sort by the precomputed slot id instead
        # and reduce with linear passes; group count stays static (no
        # sync) and key representatives come from slot ARITHMETIC.
        dense_direct = (dense_domains is not None
                        and dense_prod <= self.DENSE_DIRECT_MAX)
        dense_sorted = (dense_domains is not None and not dense_direct)
        presorted = presorted and dense_sorted
        # rows arrive sorted by segment id on the group_rows path: segment
        # totals become cumsum diffs at run bounds (linear passes) instead
        # of scatter-adds, which XLA:TPU serializes per colliding index
        segs_sorted = bool(self.group_by) and dense_domains is None
        out_cap_d = size_bucket(dense_prod) if dense_domains else None

        # ---------------- stage 1: keys, args, sort, segment ids ----------
        def _conv(r):
            return (r.data if r.data.dtype != jnp.bool_
                    else r.data.astype(jnp.int32), r.validity)

        def build1(t: Table):
            ev = self.make_evaluator(t, cmap)
            n_mask = t.row_mask()
            key_results = [ev.evaluate(e) for e in self.group_by]
            dep_results = [ev.evaluate(e) for e in self.dependent]
            arg_results = [ev.evaluate(e) for e in arg_list]
            meta = (
                [(r.dtype, r.dictionary, r.dict_sorted) for r in key_results],
                [(r.dtype, r.dictionary, r.dict_sorted) for r in arg_results],
                [(r.dtype, r.dictionary, r.dict_sorted) for r in dep_results],
            )
            key_arrays = [_conv(r) for r in key_results]
            arg_arrays = [_conv(r) for r in arg_results]
            dep_arrays = [_conv(r) for r in dep_results]
            if segs_sorted:
                key_data = tuple(joink.normalize_key(d) for d, _ in key_arrays)
                key_valid = tuple(
                    v if v is not None else jnp.ones(t.capacity, bool)
                    for _, v in key_arrays
                )
                # args + deps ride the sort as payload operands: the
                # reduction stage then needs ZERO permutation gathers
                # (take(x, perm) was a full-capacity random access)
                payloads: List[jax.Array] = []
                has_valid = []
                for d, v in arg_arrays + dep_arrays:
                    payloads.append(d)
                    has_valid.append(v is not None)
                    if v is not None:
                        payloads.append(v.astype(jnp.int8))
                (perm, seg_ids, num_groups, sorted_real, skeys, skv,
                 spay) = aggk.group_rows_payload(
                    key_data, key_valid, n_mask, tuple(payloads))
                pairs = []
                i = 0
                for hv in has_valid:
                    d = spay[i]
                    i += 1
                    v = None
                    if hv:
                        v = spay[i].astype(bool)
                        i += 1
                    pairs.append((d, v))
                sarg = pairs[: len(arg_arrays)]
                sdep = pairs[len(arg_arrays):]
                skey = [
                    (d, kv if orig_v is not None else None)
                    for (d, kv), (_, orig_v) in zip(zip(skeys, skv), key_arrays)
                ]
                # DISTINCT passes re-group in ORIGINAL row order
                dis = ((n_mask, arg_arrays) if needs_distinct_sort else None)
                return (perm, seg_ids, num_groups, sorted_real,
                        skey, sarg, sdep, dis), meta
            # dense-domain / global grouping: mixed-radix slot over the
            # key domains; NULLs take the extra top slot per key — the
            # output capacity is known statically (no host sync)
            if dense_domains is not None:
                seg_ids = jnp.zeros(t.capacity, dtype=jnp.int64)
                for r, (kind, offset, domain, _nl) in zip(key_results,
                                                          dense_domains):
                    code = r.data.astype(jnp.int64) - offset
                    if r.validity is not None:
                        code = jnp.where(r.validity, code, domain - 1)
                    seg_ids = seg_ids * domain + jnp.clip(code, 0, domain - 1)
                num_groups = jnp.int64(0)  # unused on the dense paths
            else:
                seg_ids = jnp.where(n_mask, 0, 1).astype(jnp.int64)
                num_groups = jnp.int64(1)
            if dense_sorted:
                seg_c = jnp.where(n_mask, seg_ids, jnp.int64(out_cap_d))
                if out_cap_d < 2 ** 31:
                    # 64-bit sort keys pay the emulated-i64 tax on TPU
                    seg_c = seg_c.astype(jnp.int32)
                if presorted:
                    # rows already ascend in the (single) group key: equal
                    # slots are contiguous as loaded — skip the sort.
                    # Selection-masked rows KEEP their slot (contributions
                    # are zeroed through the real-row mask threaded to
                    # stage 2) so runs stay contiguous; only capacity
                    # padding parks at out_cap.
                    in_rows = jnp.arange(t.capacity) < t.num_rows
                    sseg = jnp.where(in_rows, seg_ids,
                                     jnp.int64(out_cap_d))
                    if out_cap_d < 2 ** 31:
                        sseg = sseg.astype(jnp.int32)
                    dis = ((n_mask, arg_arrays, seg_c)
                           if needs_distinct_sort else None)
                    return (sseg, num_groups, list(arg_arrays),
                            list(dep_arrays), dis, n_mask), meta
                # sort by the slot id (padding parks at out_cap_d, so it
                # sorts last); args/deps ride as payloads — reductions
                # then run as linear passes with batched boundary scatters
                payloads = []
                has_valid = []
                for d, v in arg_arrays + dep_arrays:
                    payloads.append(d)
                    has_valid.append(v is not None)
                    if v is not None:
                        payloads.append(v.astype(jnp.int8))
                out = jax.lax.sort((seg_c,) + tuple(payloads), num_keys=1,
                                   is_stable=True)
                sseg = out[0]
                spay = out[1:]
                pairs = []
                i = 0
                for hv in has_valid:
                    d = spay[i]
                    i += 1
                    v = None
                    if hv:
                        v = spay[i].astype(bool)
                        i += 1
                    pairs.append((d, v))
                sarg = pairs[: len(arg_arrays)]
                sdep = pairs[len(arg_arrays):]
                dis = ((n_mask, arg_arrays, seg_c)
                       if needs_distinct_sort else None)
                return (sseg, num_groups, sarg, sdep, dis), meta
            return (seg_ids, num_groups, n_mask, key_arrays,
                    arg_arrays, dep_arrays), meta

        stage1, meta = run_stage(
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
                segs_sorted,
                presorted,
            ),
            cacheable=cacheable,
            used_cols=_used_cols(
                cmap, list(self.group_by) + list(self.dependent) + arg_list
            ),
        )
        key_meta, arg_meta, dep_meta = meta
        num_groups_dev = stage1[2] if segs_sorted else stage1[1]
        from hyrise_tpu.operators.base import _sync_is_expensive

        if dense_domains is not None:
            num_groups = dense_prod
            out_cap = out_cap_d
        elif self.group_by and _sync_is_expensive() \
                and table.capacity <= _SYNC_SKIP_CAP:
            # defer the group-count sync (a tunnel RTT): groups <= rows, so
            # reductions run at input capacity and empty tail slots hide
            # behind a selection mask exactly like the dense path.  Above
            # _SYNC_SKIP_CAP the padded reductions cost multiples of the
            # RTT — sync and reduce at the (much narrower) true width.
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

        def _agg_outputs(seg_c, occupied, fn, distinct, argi, sv, svalid,
                         distinct_ctx):
            """Shared aggregate lowering; sv/svalid are segment-aligned."""
            sorted_k = segs_sorted
            seg_count = (aggk.segment_count_sorted if sorted_k
                         else aggk.segment_count)
            seg_sum = (aggk.segment_sum_sorted if sorted_k
                       else aggk.segment_sum)
            seg_min = (aggk.segment_min_sorted if sorted_k
                       else aggk.segment_min)
            seg_max = (aggk.segment_max_sorted if sorted_k
                       else aggk.segment_max)
            seg_sum_sq = (aggk.segment_sum_sq_sorted if sorted_k
                          else aggk.segment_sum_sq)
            if argi < 0:
                return (occupied.astype(jnp.int64), None)
            if distinct or fn == AggregateFunction.COUNT_DISTINCT:
                data, valid, seg_orig, n_mask = distinct_ctx()
                return _distinct_agg(fn, data, valid, seg_orig, n_mask,
                                     out_cap)
            counts = seg_count(seg_c, svalid, num_segments=out_cap)
            nonempty = counts > 0
            if fn == AggregateFunction.COUNT:
                return (counts.astype(jnp.int64), None)
            if fn == AggregateFunction.SUM:
                return (seg_sum(sv, seg_c, svalid, num_segments=out_cap),
                        nonempty)
            if fn == AggregateFunction.AVG:
                sums = seg_sum(sv.astype(jnp.float64), seg_c, svalid,
                               num_segments=out_cap)
                return (sums / jnp.maximum(counts, 1), nonempty)
            if fn in (AggregateFunction.MIN, AggregateFunction.ANY):
                vals = seg_min(sv, seg_c, svalid, num_segments=out_cap)
                return (jnp.where(nonempty, vals, 0), nonempty)
            if fn == AggregateFunction.MAX:
                vals = seg_max(sv, seg_c, svalid, num_segments=out_cap)
                return (jnp.where(nonempty, vals, 0), nonempty)
            if fn == AggregateFunction.STDDEV_SAMP:
                sums = seg_sum(sv.astype(jnp.float64), seg_c, svalid,
                               num_segments=out_cap)
                sumsq = seg_sum_sq(sv, seg_c, svalid, num_segments=out_cap)
                n = counts.astype(jnp.float64)
                var = (sumsq - sums * sums / jnp.maximum(n, 1)) / jnp.maximum(
                    n - 1, 1
                )
                return (jnp.sqrt(jnp.maximum(var, 0.0)), counts > 1)
            raise NotImplementedError(f"aggregate {fn}")

        def _batched_sorted_reduce(seg_c, sorted_real, rep_pairs, sarg,
                                   distinct_ctx, consecutive=False):
            """Shared sorted-order reduction: every reduction's boundary
            scatter batches into one row-stacked scatter per dtype
            (kernels/aggregates.multi_segment_reduce_sorted).  Returns
            (occupied, rep_outputs, agg_outputs)."""
            specs = []

            def add(kind, arr):
                specs.append((kind, arr))
                return len(specs) - 1

            i_occ = add("sum", sorted_real.astype(jnp.int32))
            rep_idx = []
            for (data, valid) in rep_pairs:
                iv = (add("rep", valid.astype(jnp.int8))
                      if valid is not None else None)
                rep_idx.append((add("rep", data), iv))
            plan = []
            for (fn, distinct, argi) in agg_spec:
                if argi < 0:
                    plan.append(("star", None))
                    continue
                if distinct or fn == AggregateFunction.COUNT_DISTINCT:
                    plan.append(("distinct", (argi, fn)))
                    continue
                sv, v0 = sarg[argi]
                svalid = ((v0 & sorted_real) if v0 is not None
                          else sorted_real)
                icnt = add("sum", svalid.astype(jnp.int32))
                if fn == AggregateFunction.COUNT:
                    plan.append(("count", icnt))
                elif fn == AggregateFunction.SUM:
                    acc = sv.astype(aggk._acc_dtype(sv.dtype))
                    isum = add("sum", jnp.where(svalid, acc, 0))
                    plan.append(("sum", (isum, icnt)))
                elif fn == AggregateFunction.AVG:
                    isum = add("sum", jnp.where(
                        svalid, sv.astype(jnp.float64), 0.0))
                    plan.append(("avg", (isum, icnt)))
                elif fn in (AggregateFunction.MIN, AggregateFunction.ANY):
                    imin = add("min", jnp.where(
                        svalid, sv, aggk._max_sentinel(sv.dtype)))
                    plan.append(("minmax", (imin, icnt)))
                elif fn == AggregateFunction.MAX:
                    imax = add("max", jnp.where(
                        svalid, sv, aggk._min_sentinel(sv.dtype)))
                    plan.append(("minmax", (imax, icnt)))
                elif fn == AggregateFunction.STDDEV_SAMP:
                    f = sv.astype(jnp.float64)
                    isum = add("sum", jnp.where(svalid, f, 0.0))
                    isq = add("sum", jnp.where(svalid, f * f, 0.0))
                    plan.append(("std", (isum, isq, icnt)))
                else:
                    raise NotImplementedError(f"aggregate {fn}")
            res = aggk.multi_segment_reduce_sorted(
                seg_c, specs, out_cap, consecutive=consecutive)
            occupied = res[i_occ]
            reps = [
                (res[idd], res[iv].astype(bool) if iv is not None else None)
                for idd, iv in rep_idx
            ]
            aggs = []
            for kind, info in plan:
                if kind == "star":
                    aggs.append((occupied.astype(jnp.int64), None))
                elif kind == "distinct":
                    aggs.append(distinct_ctx(*info))
                elif kind == "count":
                    aggs.append((res[info].astype(jnp.int64), None))
                elif kind == "sum":
                    isum, icnt = info
                    aggs.append((res[isum], res[icnt] > 0))
                elif kind == "avg":
                    isum, icnt = info
                    counts = res[icnt]
                    aggs.append((res[isum] / jnp.maximum(counts, 1),
                                 counts > 0))
                elif kind == "minmax":
                    iv_, icnt = info
                    nonempty = res[icnt] > 0
                    aggs.append((jnp.where(nonempty, res[iv_], 0), nonempty))
                else:  # std
                    isum, isq, icnt = info
                    n = res[icnt].astype(jnp.float64)
                    var = (res[isq] - res[isum] * res[isum]
                           / jnp.maximum(n, 1)) / jnp.maximum(n - 1, 1)
                    aggs.append((jnp.sqrt(jnp.maximum(var, 0.0)),
                                 res[icnt] > 1))
            return occupied, reps, aggs

        def build2_sorted(perm, seg_ids, _ng, sorted_real, skey, sarg, sdep,
                          dis):
            cap = perm.shape[0]
            seg_c = jnp.where(sorted_real, seg_ids, out_cap)
            if out_cap < 2 ** 31:
                # rank ids fit int32: boundary compares/parks drop the
                # emulated-i64 tax
                seg_c = seg_c.astype(jnp.int32)
            seg_orig_cell = {}

            def distinct_for(argi, fn):
                n_mask, arg_arrays = dis
                data, valid = arg_arrays[argi]
                valid = valid if valid is not None else jnp.ones(cap, bool)
                if "seg_orig" not in seg_orig_cell:
                    seg_orig_cell["seg_orig"] = (
                        jnp.full(cap, out_cap, dtype=jnp.int64)
                        .at[perm].set(seg_c, unique_indices=True)
                    )
                return _distinct_agg(fn, data, valid,
                                     seg_orig_cell["seg_orig"], n_mask,
                                     out_cap)

            occupied, reps, aggs = _batched_sorted_reduce(
                seg_c, sorted_real, list(skey) + list(sdep), sarg,
                distinct_for, consecutive=True,
            )
            out_arrays = [(occupied, None)] + reps + aggs
            return out_arrays, None

        def build2_dense_sorted(sseg, _ng, sarg, sdep, dis, real_mask=None):
            # presorted inputs thread the true row mask (selection-masked
            # rows keep their slot to preserve run contiguity, so slot
            # range alone cannot identify them)
            sorted_real = real_mask if real_mask is not None \
                else sseg < out_cap
            # key representatives by slot ARITHMETIC: decode the mixed-
            # radix slot index back into per-key values (no scatters)
            rem = jnp.arange(out_cap, dtype=jnp.int64)
            digits = []
            for (kind, offset, domain, _nl) in reversed(dense_domains):
                digits.append(rem % domain)
                rem = rem // domain
            digits.reverse()
            key_reps = []
            for digit, (kind, offset, domain, nullable), (kdt, _d, _s) in zip(
                    digits, dense_domains, key_meta):
                data = (digit + offset).astype(physical_dtype(kdt))
                valid = (digit != domain - 1) if nullable else None
                key_reps.append((data, valid))

            def distinct_for(argi, fn):
                n_mask, arg_arrays, seg_orig = dis
                data, valid = arg_arrays[argi]
                valid = (valid if valid is not None
                         else jnp.ones(data.shape[0], bool))
                return _distinct_agg(fn, data, valid, seg_orig, n_mask,
                                     out_cap)

            occupied, reps, aggs = _batched_sorted_reduce(
                sseg, sorted_real, list(sdep), sarg, distinct_for,
            )
            out_arrays = [(occupied, None)] + key_reps + reps + aggs
            return out_arrays, None

        def build2_direct(seg_ids, _ng, n_mask, key_arrays, arg_arrays,
                          dep_arrays):
            cap = seg_ids.shape[0]
            seg_c = jnp.where(n_mask, seg_ids, out_cap)
            out_arrays = []
            occupied = aggk.segment_count(seg_c, n_mask,
                                          num_segments=out_cap)
            out_arrays.append((occupied, None))
            if self.group_by:
                pos = jnp.arange(cap, dtype=jnp.int64)
                first_pos = jax.ops.segment_min(
                    jnp.where(n_mask, pos, _POS_SENTINEL),
                    seg_c, num_segments=out_cap,
                )
                rep_rows = jnp.clip(first_pos, 0, cap - 1)
                for (data, valid) in key_arrays + dep_arrays:
                    kd = jnp.take(data, rep_rows)
                    kv = (jnp.take(valid, rep_rows)
                          if valid is not None else None)
                    out_arrays.append((kd, kv))
            for (fn, distinct, argi) in agg_spec:
                sv = svalid = None
                if argi >= 0:
                    sv, v0 = arg_arrays[argi]
                    svalid = (v0 & n_mask) if v0 is not None else n_mask

                def distinct_ctx(argi=argi):
                    data, valid = arg_arrays[argi]
                    valid = (valid if valid is not None
                             else jnp.ones(cap, bool))
                    return data, valid, seg_c, n_mask

                out_arrays.append(_agg_outputs(
                    seg_c, occupied, fn, distinct, argi, sv, svalid,
                    distinct_ctx))
            return out_arrays, None

        out_arrays, _ = run_arrays(
            "agg2",
            (build2_sorted if segs_sorted
             else build2_dense_sorted if dense_sorted else build2_direct),
            stage1,
            extra_key=(agg_spec, out_cap, bool(self.group_by), segs_sorted,
                       presorted,
                       tuple(e.key() for e in self.group_by),
                       tuple(e.key() for e in self.dependent),
                       # the dense-sorted stage BAKES the slot-decode
                       # arithmetic: same-shaped plans with different
                       # stats-derived domains must not share executables
                       tuple(dense_domains) if dense_domains else None),
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
        if dense_domains is not None and self.group_by:
            # slot order IS ascending lexicographic key order (NULLs in
            # the per-key top slot -> nulls last)
            from hyrise_tpu.types import SortMode

            out.sorted_by = [
                (e.name(), SortMode.ASC_NULLS_LAST) for e in self.group_by
            ]
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

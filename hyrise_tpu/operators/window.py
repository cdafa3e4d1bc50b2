"""Window function execution (fn() OVER (PARTITION BY ... ORDER BY ...)).

The reference models window functions but cannot execute them
(ref: lqp_translator.cpp:523-526 FailInput); here they run as one fused
device pass: sort by (partition keys, order keys), then segment-scan
arithmetic for ranks / running aggregates.

Frame semantics: ranking functions are exact; aggregate functions use the
whole partition when no ORDER BY is given and ROWS UNBOUNDED PRECEDING ..
CURRENT ROW (running) when ORDER BY is present.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from hyrise_tpu.expression import ast
from hyrise_tpu.kernels import joins as joink
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import AggregateFunction as AF
from hyrise_tpu.types import DataType, physical_dtype
from hyrise_tpu.kernels.sortops import sort_permutation


class WindowOperator(AbstractReadOnlyOperator):
    def __init__(self, in_op, window_expr: ast.WindowExpression):
        super().__init__(in_op)
        self.window_expr = window_expr
        self.output_expressions = list(in_op.output_expressions) + [window_expr]

    def _on_execute(self) -> Table:
        self.output_expressions = (
            list(self._left.output_expressions) + [self.window_expr]
        )
        table = self.input_table_left().materialize().decoded()
        w = self.window_expr
        cap = table.capacity
        n = table.num_rows
        ev = self.make_evaluator(table, self._column_map(self._left))

        keys = []
        modes = []
        from hyrise_tpu.types import SortMode

        for e in w.partition_by:
            r = ev.evaluate(e)
            keys.append((joink.normalize_key(r.data), r.validity))
            modes.append(SortMode.ASC_NULLS_FIRST)
        for e, mode in w.order_by:
            r = ev.evaluate(e)
            data = r.data
            if data.dtype == jnp.bool_:
                data = data.astype(jnp.int32)
            keys.append((data, r.validity))
            modes.append(mode)
        if not keys:
            keys = [(jnp.zeros(cap, dtype=jnp.int32), None)]
            modes = [SortMode.ASC_NULLS_FIRST]
        perm = sort_permutation(keys, modes, n)

        # partition boundaries in sorted order; padding rows (sorted last)
        # are fenced into their own partition so position-based ends
        # (LAST_VALUE/LEAD/CUME_DIST) never bleed past row n-1
        part_new = jnp.zeros(cap, dtype=bool).at[0].set(True)
        if n < cap:
            part_new = part_new.at[n].set(True)
        for e in w.partition_by:
            r = ev.evaluate(e)
            k = joink.normalize_key(r.data)
            if r.validity is not None:
                k = jnp.where(r.validity, k, jnp.int64(-(2**62)))
            sk = jnp.take(k, perm)
            part_new = part_new | jnp.concatenate(
                [jnp.ones(1, bool), sk[1:] != sk[:-1]]
            )
        # peer boundaries: partition or order-key change
        peer_new = part_new
        for e, _ in w.order_by:
            r = ev.evaluate(e)
            k = joink.normalize_key(r.data)
            if r.validity is not None:
                k = jnp.where(r.validity, k, jnp.int64(-(2**62)))
            sk = jnp.take(k, perm)
            peer_new = peer_new | jnp.concatenate(
                [jnp.ones(1, bool), sk[1:] != sk[:-1]]
            )

        pos = jnp.arange(cap, dtype=jnp.int64)
        part_id = jnp.cumsum(part_new.astype(jnp.int64)) - 1
        # position of partition start for each sorted row
        part_start = jnp.take(
            jnp.where(part_new, pos, 0), _running_last_true(part_new)
        )
        row_in_part = pos - part_start

        fn = w.function
        sorted_vals = None
        sorted_valid = None
        arg_dict = None
        arg_dict_sorted = True
        if w.argument is not None:
            r = ev.evaluate(w.argument)
            sorted_vals = jnp.take(r.data, perm)
            sorted_valid = (
                jnp.take(r.validity, perm) if r.validity is not None
                else jnp.ones(cap, bool)
            )
            arg_dtype = r.dtype
            arg_dict = r.dictionary
            arg_dict_sorted = r.dict_sorted

        if fn == AF.ROW_NUMBER:
            out_sorted = row_in_part + 1
            out_dt = DataType.LONG
            out_valid_sorted = None
        elif fn in (AF.RANK, AF.DENSE_RANK, AF.PERCENT_RANK, AF.CUME_DIST):
            # rank = position of first peer in partition + 1
            peer_start = jnp.take(
                jnp.where(peer_new, pos, 0), _running_last_true(peer_new)
            )
            rank = peer_start - part_start + 1
            if fn == AF.RANK:
                out_sorted = rank
                out_dt = DataType.LONG
            elif fn == AF.DENSE_RANK:
                dense = jnp.cumsum(peer_new.astype(jnp.int64)) - jnp.take(
                    jnp.cumsum(peer_new.astype(jnp.int64)) - 1,
                    _running_last_true(part_new),
                )
                out_sorted = dense
                out_dt = DataType.LONG
            else:
                part_size = _partition_sizes(part_new, cap)
                if fn == AF.PERCENT_RANK:
                    out_sorted = (rank - 1).astype(jnp.float64) / jnp.maximum(
                        part_size - 1, 1
                    )
                else:  # CUME_DIST: peers' last position + 1 over size
                    peer_end = _peer_end_positions(peer_new, cap)
                    out_sorted = (peer_end - part_start + 1).astype(
                        jnp.float64
                    ) / jnp.maximum(part_size, 1)
                out_dt = DataType.DOUBLE
            out_valid_sorted = None
        elif fn in (AF.SUM, AF.COUNT, AF.AVG, AF.MIN, AF.MAX):
            acc_dtype = (
                jnp.float64
                if (sorted_vals is not None and jnp.issubdtype(sorted_vals.dtype, jnp.floating))
                else jnp.int64
            )
            if fn == AF.COUNT and w.argument is None:
                vals = jnp.ones(cap, dtype=jnp.int64)
                valid = jnp.ones(cap, bool)
            else:
                vals = sorted_vals.astype(acc_dtype)
                valid = sorted_valid
            frame = getattr(w, "frame", None)
            end_unbounded = frame is not None and frame[1] == "following"
            if w.order_by and not end_unbounded:
                out_sorted, out_valid_sorted, out_dt = _running_agg(
                    fn, vals, valid, part_new, part_start, pos,
                    arg_dtype if w.argument is not None else DataType.LONG,
                )
                if frame is None or frame[0] == "range":
                    # SQL default frame is RANGE UNBOUNDED PRECEDING ..
                    # CURRENT ROW: order-key peers share the aggregate of
                    # the LAST peer row, not their own running prefix
                    src = jnp.clip(_peer_end_positions(peer_new, cap),
                                   0, cap - 1)
                    out_sorted = jnp.take(out_sorted, src)
                    if out_valid_sorted is not None:
                        out_valid_sorted = jnp.take(out_valid_sorted, src)
            else:
                out_sorted, out_valid_sorted, out_dt = _whole_partition_agg(
                    fn, vals, valid, part_id, cap,
                    arg_dtype if w.argument is not None else DataType.LONG,
                )
        elif fn in (AF.LAG, AF.LEAD):
            offset, default = (w.extra + (1, None))[:2] if w.extra else (1, None)
            src = jnp.where(
                pos < n, pos + (offset if fn == AF.LEAD else -offset), pos
            )
            part_end = _partition_end_positions(part_new, cap)
            inbounds = (src >= part_start) & (src <= part_end) & (pos < n)
            src_c = jnp.clip(src, 0, cap - 1)
            out_sorted = jnp.take(sorted_vals, src_c)
            out_valid_sorted = inbounds & jnp.take(sorted_valid, src_c)
            if default is not None:
                if arg_dtype == DataType.STRING:
                    raise NotImplementedError(
                        "lag/lead string defaults not supported")
                dv = jnp.asarray(default, dtype=sorted_vals.dtype)
                out_sorted = jnp.where(inbounds, out_sorted, dv)
                out_valid_sorted = jnp.where(
                    inbounds, jnp.take(sorted_valid, src_c), True)
            out_dt = arg_dtype
        elif fn in (AF.FIRST_VALUE, AF.LAST_VALUE):
            # default frame: RANGE UNBOUNDED PRECEDING .. CURRENT ROW —
            # FIRST_VALUE reads the partition start, LAST_VALUE the last
            # peer of the current row (SQL standard / sqlite semantics)
            frame = getattr(w, "frame", None)
            end_unbounded = frame is not None and frame[1] == "following"
            if fn == AF.FIRST_VALUE:
                src = part_start
            elif end_unbounded or not w.order_by:
                src = _partition_end_positions(part_new, cap)
            elif frame is not None and frame[0] == "rows":
                src = pos
            else:
                src = _peer_end_positions(peer_new, cap)
            src_c = jnp.clip(src, 0, cap - 1)
            out_sorted = jnp.take(sorted_vals, src_c)
            out_valid_sorted = jnp.take(sorted_valid, src_c)
            out_dt = arg_dtype
        elif fn == AF.NTILE:
            nt = int(w.extra[0]) if w.extra else 1
            if nt < 1:
                raise ValueError("ntile(n) requires n >= 1")
            part_size = _partition_sizes(part_new, cap)
            q = part_size // nt
            rem = part_size % nt
            cut = rem * (q + 1)  # rows in the (q+1)-sized leading buckets
            out_sorted = jnp.where(
                row_in_part < cut,
                row_in_part // jnp.maximum(q + 1, 1),
                rem + (row_in_part - cut) // jnp.maximum(q, 1),
            ) + 1
            out_dt = DataType.LONG
            out_valid_sorted = None
        else:
            raise NotImplementedError(f"window function {fn}")

        # scatter back to original row order
        # perm is a permutation: unique indices keep the scatter parallel
        inv = jnp.zeros(cap, dtype=jnp.int64).at[perm].set(
            pos, unique_indices=True)
        out = jnp.take(out_sorted, inv)
        out_valid = (
            jnp.take(out_valid_sorted, inv) if out_valid_sorted is not None else None
        )
        dict_out = arg_dict if out_dt == DataType.STRING else None
        col = Column(out_dt, out.astype(physical_dtype(out_dt)), out_valid,
                     dict_out, arg_dict_sorted if dict_out is not None else True)
        return Table(
            table.column_names + [w.name()],
            table.columns + [col],
            n,
        )


def _running_last_true(flags: jax.Array) -> jax.Array:
    """For each position, index of the most recent True at or before it."""
    pos = jnp.arange(flags.shape[0], dtype=jnp.int64)
    marked = jnp.where(flags, pos, jnp.int64(-1))
    return jax.lax.cummax(marked)


def _partition_end_positions(part_new, cap):
    """Last position of each row's partition."""
    pos = jnp.arange(cap, dtype=jnp.int64)
    part_id = jnp.cumsum(part_new.astype(jnp.int64)) - 1
    ends = jax.ops.segment_max(pos, part_id, num_segments=cap)
    return jnp.take(ends, part_id)


def _partition_sizes(part_new, cap):
    part_id = jnp.cumsum(part_new.astype(jnp.int64)) - 1
    sizes = jax.ops.segment_sum(jnp.ones(cap, jnp.int64), part_id,
                                num_segments=cap)
    return jnp.take(sizes, part_id)


def _peer_end_positions(peer_new, cap):
    """Last position of each row's peer group."""
    pos = jnp.arange(cap, dtype=jnp.int64)
    peer_id = jnp.cumsum(peer_new.astype(jnp.int64)) - 1
    ends = jax.ops.segment_max(pos, peer_id, num_segments=cap)
    return jnp.take(ends, peer_id)


def _running_agg(fn, vals, valid, part_new, part_start, pos, arg_dtype):
    vals_z = jnp.where(valid, vals, 0)
    csum = jnp.cumsum(vals_z)
    ccnt = jnp.cumsum(valid.astype(jnp.int64))
    base_sum = jnp.take(csum, jnp.maximum(part_start - 1, 0))
    base_cnt = jnp.take(ccnt, jnp.maximum(part_start - 1, 0))
    base_sum = jnp.where(part_start == 0, 0, base_sum)
    base_cnt = jnp.where(part_start == 0, 0, base_cnt)
    run_sum = csum - base_sum
    run_cnt = ccnt - base_cnt
    if fn == AF.COUNT:
        return run_cnt, None, DataType.LONG
    if fn == AF.SUM:
        dt = DataType.LONG if arg_dtype in (DataType.INT, DataType.LONG) else DataType.DOUBLE
        return run_sum, run_cnt > 0, dt
    if fn == AF.AVG:
        return (
            run_sum.astype(jnp.float64) / jnp.maximum(run_cnt, 1),
            run_cnt > 0,
            DataType.DOUBLE,
        )
    if fn in (AF.MIN, AF.MAX):
        if jnp.issubdtype(vals.dtype, jnp.floating):
            big = jnp.inf if fn == AF.MIN else -jnp.inf
        else:
            big = jnp.iinfo(vals.dtype).max if fn == AF.MIN else jnp.iinfo(vals.dtype).min
        v = jnp.where(valid, vals, big)
        # segmented running min/max: reset at partition starts via cummax of
        # (segment base); use associative scan on (value, segment) pairs
        seg = jnp.cumsum(part_new.astype(jnp.int64)) - 1

        def combine(a, b):
            (va, sa) = a
            (vb, sb) = b
            keep = sb == sa
            merged = jnp.minimum(va, vb) if fn == AF.MIN else jnp.maximum(va, vb)
            return (jnp.where(keep, merged, vb), sb)

        out, _ = jax.lax.associative_scan(combine, (v, seg))
        dt = arg_dtype
        return out, run_cnt > 0, dt
    raise NotImplementedError(fn)


def _whole_partition_agg(fn, vals, valid, part_id, cap, arg_dtype):
    vals_z = jnp.where(valid, vals, 0)
    sums = jax.ops.segment_sum(vals_z, part_id, num_segments=cap)
    cnts = jax.ops.segment_sum(valid.astype(jnp.int64), part_id, num_segments=cap)
    if fn == AF.COUNT:
        return jnp.take(cnts, part_id), None, DataType.LONG
    if fn == AF.SUM:
        dt = DataType.LONG if arg_dtype in (DataType.INT, DataType.LONG) else DataType.DOUBLE
        return jnp.take(sums, part_id), jnp.take(cnts, part_id) > 0, dt
    if fn == AF.AVG:
        avg = sums.astype(jnp.float64) / jnp.maximum(cnts, 1)
        return jnp.take(avg, part_id), jnp.take(cnts, part_id) > 0, DataType.DOUBLE
    if fn in (AF.MIN, AF.MAX):
        if jnp.issubdtype(vals.dtype, jnp.floating):
            sentinel = jnp.inf if fn == AF.MIN else -jnp.inf
        else:
            sentinel = (
                jnp.iinfo(vals.dtype).max if fn == AF.MIN
                else jnp.iinfo(vals.dtype).min
            )
        seg_fn = jax.ops.segment_min if fn == AF.MIN else jax.ops.segment_max
        m = seg_fn(jnp.where(valid, vals, sentinel), part_id, num_segments=cap)
        return jnp.take(m, part_id), jnp.take(cnts, part_id) > 0, arg_dtype
    raise NotImplementedError(fn)

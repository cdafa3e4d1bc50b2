"""MVCC visibility filter (ref: operators/validate.hpp:20, formula
validate.cpp:45-53):

  visible = snapshot_cid < end_cid
            AND ((snapshot_cid >= begin_cid) != (row_tid == our_tid))

The whole-table shortcut (validate.cpp:56-67) skips device work entirely
when no version churn can affect this snapshot.  The predicate itself is a
pure elementwise formula — ideal VPU work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hyrise_tpu.database import Database
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table


@partial(jax.jit, static_argnames=("cap",))
def _visibility_mask(begin, end, tids, snapshot, our_tid, num_rows,
                     selection, cap):
    """One fused dispatch for the visibility formula (the eager op chain
    cost ~2.5 ms per OLTP statement on capacity-sized tables)."""
    b, e, t = begin[:cap], end[:cap], tids[:cap]
    vis = (snapshot < e) & ((snapshot >= b) != (t == our_tid))
    vis = vis & (jnp.arange(cap) < num_rows)
    if selection is not None:
        vis = vis & selection
    return vis


class Validate(AbstractReadOnlyOperator):
    def __init__(self, in_op):
        super().__init__(in_op)
        self.output_expressions = list(in_op.output_expressions)

    def _on_execute(self) -> Table:
        table = self.input_table_left()
        self.output_expressions = list(self._left.output_expressions)
        mvcc = table.mvcc
        if mvcc is None:
            return table
        ctx = self.transaction_context
        if ctx is not None:
            snapshot = ctx.snapshot_commit_id
            our_tid = ctx.transaction_id
        else:
            snapshot = Database.get().transaction_manager.last_commit_id
            our_tid = 0
        if mvcc.all_visible_shortcut(snapshot):
            return table
        begin, end, tids = mvcc.device_arrays()
        visible = _visibility_mask(
            begin, end, tids,
            jnp.asarray(snapshot, dtype=begin.dtype),
            jnp.asarray(our_tid, dtype=tids.dtype),
            jnp.asarray(table.num_rows, dtype=jnp.int32),
            table.selection,
            table.capacity,
        )
        out = Table(table.column_names, table.columns, table.num_rows,
                    selection=visible)
        out.sorted_by = table.sorted_by
        return out

    def _describe_self(self) -> str:
        return "Validate"

"""Set operations: UNION [ALL], INTERSECT, EXCEPT
(ref: operators/union_all.hpp:14, union_positions.hpp:72 — positional
variant —, difference.hpp:18; INTERSECT is modeled in the reference's SQL
translator via rewrites).

Distinct semantics run as one fused sort-based grouping over all columns
with an origin tag; per-group left/right counts decide membership.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from hyrise_tpu.kernels import aggregates as aggk
from hyrise_tpu.kernels import joins as joink
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.operators.joins import concat_tables
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, size_bucket


class UnionAll(AbstractReadOnlyOperator):
    def __init__(self, left_op, right_op, out_exprs=None):
        super().__init__(left_op, right_op)
        # the LQP mints fresh column identities for set-op outputs
        # (see plan/lqp.py::_mint_setop_outputs); keep them if given
        self._out_override = out_exprs
        self.output_expressions = (
            list(out_exprs) if out_exprs is not None
            else list(left_op.output_expressions)
        )

    def _on_execute(self) -> Table:
        if self._out_override is None:
            self.output_expressions = list(self._left.output_expressions)
        return concat_tables([
            self.input_table_left().materialize().decoded(),
            self.input_table_right().materialize().decoded(),
        ])

    def _describe_self(self):
        return "UnionAll"


class _SetOpBase(AbstractReadOnlyOperator):
    """Shared machinery: concat with origin tag, group all columns, count
    per side, emit one representative row per qualifying group."""

    def __init__(self, left_op, right_op, out_exprs=None):
        super().__init__(left_op, right_op)
        self._out_override = out_exprs
        self.output_expressions = (
            list(out_exprs) if out_exprs is not None
            else list(left_op.output_expressions)
        )

    def _qualifies(self, left_count, right_count):
        raise NotImplementedError

    def _on_execute(self) -> Table:
        if self._out_override is None:
            self.output_expressions = list(self._left.output_expressions)
        L = self.input_table_left().materialize().decoded()
        R = self.input_table_right().materialize().decoded()
        combined = concat_tables([L, R])
        cap = combined.capacity
        n_mask = combined.row_mask()
        from_left = jnp.arange(cap) < L.num_rows

        key_data = tuple(
            joink.normalize_key(c.data) for c in combined.columns
        )
        key_valid = tuple(
            c.validity if c.validity is not None else jnp.ones(cap, bool)
            for c in combined.columns
        )
        perm, seg_ids, num_groups_dev = aggk.group_rows(key_data, key_valid, n_mask)
        num_groups = int(num_groups_dev)
        out_cap = size_bucket(num_groups)
        sorted_real = jnp.take(n_mask, perm)
        seg_c = jnp.where(sorted_real, seg_ids, out_cap)
        from_left_s = jnp.take(from_left, perm)
        lcount = jax.ops.segment_sum(
            (from_left_s & sorted_real).astype(jnp.int64), seg_c, num_segments=out_cap
        )
        rcount = jax.ops.segment_sum(
            (~from_left_s & sorted_real).astype(jnp.int64), seg_c, num_segments=out_cap
        )
        qualifies = self._qualifies(lcount, rcount)
        # representative: first sorted position per group
        pos = jnp.arange(cap, dtype=jnp.int64)
        first_pos = jax.ops.segment_min(
            jnp.where(sorted_real, pos, jnp.iinfo(jnp.int64).max),
            seg_c,
            num_segments=out_cap,
        )
        first_pos = jnp.clip(first_pos, 0, cap - 1)
        rep_rows = jnp.take(perm, first_pos)
        n_out = int(jnp.sum(qualifies[:out_cap], dtype=jnp.int64))
        cap_out = size_bucket(n_out)
        (sel,) = jnp.nonzero(qualifies, size=cap_out, fill_value=0)
        rows = jnp.take(rep_rows, sel)
        return combined.take(rows, n_out)

    def _describe_self(self):
        return type(self).__name__


class UnionUnique(_SetOpBase):
    """UNION (distinct)."""

    def _qualifies(self, l, r):
        return (l + r) > 0


class Intersect(_SetOpBase):
    def _qualifies(self, l, r):
        return (l > 0) & (r > 0)


class Difference(_SetOpBase):
    """EXCEPT (ref: operators/difference.hpp:18)."""

    def _qualifies(self, l, r):
        return (l > 0) & (r == 0)


class Distinct(_SetOpBase):
    """SELECT DISTINCT as a unary set op (right side empty)."""

    def __init__(self, in_op):
        # reuse the machinery with an empty right side
        super().__init__(in_op, None)

    def inputs(self):
        return [self._left]

    def _on_execute(self) -> Table:
        self.output_expressions = list(self._left.output_expressions)
        L = self.input_table_left().materialize().decoded()
        cap = L.capacity
        n_mask = L.row_mask()
        key_data = tuple(joink.normalize_key(c.data) for c in L.columns)
        key_valid = tuple(
            c.validity if c.validity is not None else jnp.ones(cap, bool)
            for c in L.columns
        )
        perm, seg_ids, num_groups_dev = aggk.group_rows(key_data, key_valid, n_mask)
        num_groups = int(num_groups_dev)
        out_cap = size_bucket(num_groups)
        sorted_real = jnp.take(n_mask, perm)
        seg_c = jnp.where(sorted_real, seg_ids, out_cap)
        pos = jnp.arange(cap, dtype=jnp.int64)
        first_pos = jax.ops.segment_min(
            jnp.where(sorted_real, pos, jnp.iinfo(jnp.int64).max),
            seg_c,
            num_segments=out_cap,
        )
        first_pos = jnp.clip(first_pos, 0, cap - 1)
        rep_rows = jnp.take(perm, first_pos)
        return L.take(rep_rows, num_groups)

"""LIMIT/OFFSET (ref: operators/limit.hpp:13)."""

from __future__ import annotations

import jax.numpy as jnp

from hyrise_tpu.expression import ast
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table


class Limit(AbstractReadOnlyOperator):
    def __init__(self, in_op, row_count: int, offset: int = 0):
        super().__init__(in_op)
        self.row_count = row_count
        self.offset = offset
        self.output_expressions = list(in_op.output_expressions)

    def _on_execute(self) -> Table:
        table = self.input_table_left()
        self.output_expressions = list(self._left.output_expressions)
        # selection-based: keep valid rows [offset, offset+row_count) by
        # position among valid rows — no host sync, order preserved
        mask = table.row_mask()
        pos = jnp.cumsum(mask.astype(jnp.int64)) - 1
        sel = mask & (pos >= self.offset) & (pos < self.offset + self.row_count)
        out = Table(table.column_names, table.columns, table.num_rows,
                    selection=sel)
        out.sorted_by = table.sorted_by
        return out

    def _describe_self(self) -> str:
        return f"Limit({self.row_count}, offset={self.offset})"

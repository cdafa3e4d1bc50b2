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
        start = min(self.offset, table.num_rows)
        n = max(0, min(self.row_count, table.num_rows - start))
        idx = jnp.arange(table.capacity) + start
        idx = jnp.clip(idx, 0, table.capacity - 1)
        out = table.take(idx, n)
        out.sorted_by = table.sorted_by
        return out

    def _describe_self(self) -> str:
        return f"Limit({self.row_count}, offset={self.offset})"

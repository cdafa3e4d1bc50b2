"""Predicate filter (ref: operators/table_scan.hpp:21).

The reference dispatches to per-encoding scan impls iterating segments
(table_scan.cpp:312-397); here the whole predicate evaluates as one fused
device expression producing a selection mask, then rows are compacted via
count -> bucket -> gather.  Late materialization (ReferenceSegments) becomes
"gather only once, after the full conjunction".
"""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table


class TableScan(AbstractReadOnlyOperator):
    def __init__(self, in_op, predicate: ast.Expression):
        super().__init__(in_op)
        self.predicate = predicate
        self.output_expressions = list(in_op.output_expressions)

    def _on_execute(self) -> Table:
        table = self.input_table_left()
        self.output_expressions = list(self._left.output_expressions)
        ev = self.make_evaluator(table, self._column_map(self._left))
        mask = ev.selection_mask(self.predicate) & table.row_mask()
        return self.compact(table, mask)

    def _describe_self(self) -> str:
        return f"TableScan({self.predicate.description()})"

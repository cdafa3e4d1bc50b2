"""Expression projection (ref: operators/projection.hpp:23 — evaluates an
expression list, forwarding input columns where possible)."""

from __future__ import annotations

from typing import List, Optional, Sequence

from hyrise_tpu.expression import ast
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table


class Projection(AbstractReadOnlyOperator):
    def __init__(self, in_op, expressions: Sequence[ast.Expression],
                 names: Optional[Sequence[str]] = None):
        super().__init__(in_op)
        self.expressions = list(expressions)
        self.names = list(names) if names is not None else None
        self.output_expressions = list(expressions)

    def _on_execute(self) -> Table:
        table = self.input_table_left()
        cmap = self._column_map(self._left)
        ev = self.make_evaluator(table, cmap)
        columns = []
        names = []
        for i, expr in enumerate(self.expressions):
            if expr.key() in cmap:
                col = table.columns[cmap[expr.key()]]
            else:
                col = ev.evaluate(expr).to_column()
            columns.append(col)
            names.append(
                self.names[i] if self.names is not None else expr.name()
            )
        return Table(names, columns, table.num_rows)

    def _describe_self(self) -> str:
        return "Projection(" + ", ".join(e.description() for e in self.expressions) + ")"

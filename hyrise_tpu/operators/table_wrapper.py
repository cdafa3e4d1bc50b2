"""Leaf operator wrapping a literal table (ref: operators/table_wrapper.hpp:16)."""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table


class TableWrapper(AbstractReadOnlyOperator):
    def __init__(self, table: Table):
        super().__init__()
        self._table = table
        self.output_expressions = [
            ast.ColumnRef(name, col.data_type, col.validity is not None)
            for name, col in zip(table.column_names, table.columns)
        ]

    def _on_execute(self) -> Table:
        return self._table

    def _describe_self(self) -> str:
        return f"TableWrapper({self._table!r})"

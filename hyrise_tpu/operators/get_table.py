"""Leaf operator reading a stored table with column/block pruning
(ref: operators/get_table.hpp:23 — static+dynamic chunk pruning and column
pruning applied at the leaf)."""

from __future__ import annotations

from typing import List, Optional, Sequence

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table


class GetTable(AbstractReadOnlyOperator):
    def __init__(
        self,
        table_name: str,
        pruned_column_names: Sequence[str] = (),
        output_expressions: Optional[List[ast.Expression]] = None,
        include_row_ids: bool = False,
    ):
        super().__init__()
        self.table_name = table_name
        self.pruned_column_names = set(pruned_column_names)
        self.include_row_ids = include_row_ids
        if output_expressions is not None:
            self.output_expressions = output_expressions

    def _on_execute(self) -> Table:
        import jax.numpy as jnp

        from hyrise_tpu.storage.column import Column
        from hyrise_tpu.types import DataType

        sm = Database.get().storage_manager
        table = sm.get_table(self.table_name)
        keep = [n for n in table.column_names if n not in self.pruned_column_names]
        out = table.select(keep) if self.pruned_column_names else table
        out.mvcc = table.mvcc
        if self.include_row_ids:
            rowid = Column(
                DataType.LONG, jnp.arange(out.capacity, dtype=jnp.int64)
            )
            out = Table(
                out.column_names + ["__rowid__"],
                out.columns + [rowid],
                out.num_rows,
            )
            out.mvcc = table.mvcc
        if not self.output_expressions:
            self.output_expressions = [
                ast.ColumnRef(n, c.data_type, c.validity is not None,
                              origin=self.table_name)
                for n, c in zip(out.column_names, out.columns)
            ]
        return out

    def _describe_self(self) -> str:
        return f"GetTable({self.table_name})"

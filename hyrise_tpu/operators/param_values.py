"""Leaf materializing a parameterized VALUES list from bound parameters
(ref: prepared_plan.cpp placeholder binding + operators/insert.cpp — the
reference binds placeholders into its cached PQP; here the bound rows
build host-side and upload once, so every downstream compiled stage keyed
on the table signature is reused across bindings)."""

from __future__ import annotations

from typing import Dict, List, Sequence

from hyrise_tpu.expression import ast
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table


class ParamValues(AbstractReadOnlyOperator):
    def __init__(self, rows: Sequence[Sequence[ast.Expression]],
                 columns: Sequence[str], types: Dict[str, object]):
        super().__init__()
        self.rows = rows
        self.columns = list(columns)
        self.types = types
        self.output_expressions = [
            ast.ColumnRef(c, types[c], True) for c in self.columns
        ]

    def _resolve(self, e: ast.Expression):
        if isinstance(e, ast.Literal):
            return e.value
        if isinstance(e, ast.Parameter):
            try:
                return self.parameters[e.parameter_id]
            except KeyError:
                raise RuntimeError(
                    f"unbound parameter ${e.parameter_id} in VALUES"
                ) from None
        if isinstance(e, ast.UnaryMinus):
            v = self._resolve(e.children[0])
            return None if v is None else -v
        raise RuntimeError(f"unsupported VALUES expression {e.description()}")

    def _on_execute(self) -> Table:
        data: Dict[str, List] = {c: [] for c in self.columns}
        for row in self.rows:
            for c, e in zip(self.columns, row):
                data[c].append(self._resolve(e))
        return Table.from_dict(data, self.types)

    def _describe_self(self) -> str:
        return f"ParamValues({len(self.rows)}x{len(self.columns)})"

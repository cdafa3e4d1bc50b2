"""Column renaming (ref: operators/alias_operator.hpp:16)."""

from __future__ import annotations

from typing import Sequence

from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table


class AliasOperator(AbstractReadOnlyOperator):
    def __init__(self, in_op, names: Sequence[str]):
        super().__init__(in_op)
        self.names = list(names)
        self.output_expressions = list(in_op.output_expressions)

    def _on_execute(self) -> Table:
        table = self.input_table_left()
        self.output_expressions = list(self._left.output_expressions)
        return table.rename(self.names)

    def _describe_self(self) -> str:
        return f"Alias({', '.join(self.names)})"

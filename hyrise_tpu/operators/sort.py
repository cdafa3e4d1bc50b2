"""ORDER BY operator (ref: operators/sort.hpp:23 — multi-column sort with
four null-order modes; here a single fused lexicographic device sort)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from hyrise_tpu.expression import ast
from hyrise_tpu.kernels import sortops
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, SortMode


class Sort(AbstractReadOnlyOperator):
    def __init__(self, in_op, sort_definitions: Sequence[Tuple[ast.Expression, SortMode]]):
        super().__init__(in_op)
        self.sort_definitions = list(sort_definitions)
        self.output_expressions = list(in_op.output_expressions)

    def _on_execute(self) -> Table:
        table = self.input_table_left()
        self.output_expressions = list(self._left.output_expressions)
        ev = self.make_evaluator(table, self._column_map(self._left))
        keys = []
        modes = []
        for expr, mode in self.sort_definitions:
            r = ev.evaluate(expr)
            data = r.data
            if r.dtype == DataType.STRING and not r.dict_sorted:
                raise NotImplementedError("sort on unsorted dictionary")
            if data.dtype == jnp.bool_:
                data = data.astype(jnp.int32)
            keys.append((data, r.validity))
            modes.append(mode)
        perm = sortops.sort_permutation(keys, modes, table.num_rows)
        out = table.take(perm, table.num_rows)
        out.sorted_by = [
            (e.name(), m) for e, m in self.sort_definitions
        ]
        return out

    def _describe_self(self) -> str:
        parts = ", ".join(
            f"{e.description()} {m.value}" for e, m in self.sort_definitions
        )
        return f"Sort({parts})"

"""Index-backed scan (ref: operators/index_scan.hpp:22 — chunk-index lookup
producing a pos list; here an OrderedIndex binary search producing a
selection mask, composable with every mask consumer downstream)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.kernels import joins as joink
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, PredicateCondition


class IndexScan(AbstractReadOnlyOperator):
    def __init__(self, in_op, table_name: str, column_name: str,
                 condition: PredicateCondition, value, value2=None):
        super().__init__(in_op)
        self.table_name = table_name
        self.column_name = column_name
        self.condition = condition
        self.value = value
        self.value2 = value2
        self.output_expressions = list(in_op.output_expressions)

    def _on_execute(self) -> Table:
        table = self.input_table_left()
        self.output_expressions = list(self._left.output_expressions)
        registry = Database.get().index_registry
        index = registry.ordered_index(self.table_name, self.column_name)
        if index is None:
            base = Database.get().storage_manager.get_table(self.table_name)
            index = registry.create_ordered_index(
                self.table_name, base, self.column_name
            )
        lo, hi = self._bounds(table)
        mask = index.row_mask_for_range(lo, hi, table.capacity,
                                        base_mask=table.row_mask())
        return Table(table.column_names, table.columns, table.num_rows,
                     selection=mask)

    def _bounds(self, table: Table):
        col = table.column(self.column_name)
        v, exact = _encode(col, self.value)
        c = self.condition
        lo_inf = jnp.iinfo(jnp.int64).min
        hi_inf = jnp.iinfo(jnp.int64).max
        if c == PredicateCondition.EQUALS:
            return (v, v) if exact else (1, 0)  # absent value: empty range
        if c == PredicateCondition.LESS_THAN:
            return lo_inf, v - 1
        if c == PredicateCondition.LESS_THAN_EQUALS:
            return lo_inf, v if exact else v - 1
        if c == PredicateCondition.GREATER_THAN:
            # for an absent string value, v already names the first larger
            # dictionary entry, so the range starts at v
            return (v + 1 if exact else v), hi_inf
        if c == PredicateCondition.GREATER_THAN_EQUALS:
            return v, hi_inf
        if c == PredicateCondition.BETWEEN_INCLUSIVE:
            v2, exact2 = _encode(col, self.value2)
            return v, v2 if exact2 else v2 - 1
        raise NotImplementedError(c)

    def _describe_self(self):
        return (f"IndexScan({self.table_name}.{self.column_name} "
                f"{self.condition.value} {self.value})")


def _encode(col, value):
    """-> (code, exact): code-space bound + whether the value exists
    verbatim (string ranks are lower bounds when the word is absent)."""
    if col.data_type == DataType.STRING:
        import numpy as np

        rank = int(np.searchsorted(col.dictionary, value))
        exact = rank < len(col.dictionary) and col.dictionary[rank] == value
        return rank, exact
    if col.data_type == DataType.DATE and isinstance(value, str):
        from hyrise_tpu.utils.dates import single_date_to_days

        return single_date_to_days(value), True
    return int(value), True


class CompositeIndexScan(AbstractReadOnlyOperator):
    """Conjunctive-equality lookup through a CompositeOrderedIndex (ref:
    composite_group_key_index.hpp:43 — multi-column point probes).  Covers
    the whole equality conjunction in ONE binary search; the translator
    only emits it when an index on exactly that column set exists."""

    def __init__(self, in_op, table_name: str, column_names, values):
        super().__init__(in_op)
        self.table_name = table_name
        self.column_names = tuple(column_names)
        self.values = tuple(values)
        self.output_expressions = list(in_op.output_expressions)

    def _on_execute(self) -> Table:
        table = self.input_table_left()
        self.output_expressions = list(self._left.output_expressions)
        registry = Database.get().index_registry
        index = registry.composite_index(self.table_name, self.column_names)
        if index is None:
            base = Database.get().storage_manager.get_table(self.table_name)
            index = registry.create_composite_index(
                self.table_name, base, self.column_names
            )
        codes = []
        for name, value in zip(self.column_names, self.values):
            code, exact = _encode(table.column(name), value)
            if not exact:
                return Table(table.column_names, table.columns,
                             table.num_rows,
                             selection=jnp.zeros(table.capacity, dtype=bool))
            codes.append(code)
        mask = index.row_mask_for_equals(codes, table.capacity,
                                         base_mask=table.row_mask())
        return Table(table.column_names, table.columns, table.num_rows,
                     selection=mask)

    def _describe_self(self):
        pairs = ", ".join(f"{c} = {v!r}" for c, v in
                          zip(self.column_names, self.values))
        return f"CompositeIndexScan({self.table_name}: {pairs})"

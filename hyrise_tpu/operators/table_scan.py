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
        from hyrise_tpu.operators.compiled import run_stage

        table = self.input_table_left()
        self.output_expressions = list(self._left.output_expressions)
        cmap = self._column_map(self._left)

        def build(t: Table, bound=None, subs=None):
            ev = self.make_evaluator(t, cmap, parameters=bound,
                                     sub_results=subs)
            return ev.selection_mask(self.predicate) & t.row_mask(), None

        # numeric subquery results enter the stage as traced inputs, so
        # re-execution with new subquery values reuses the executable
        from hyrise_tpu.operators.compiled import (
            subs_traceable,
            used_column_indices,
        )

        sub_results = getattr(self, "_sub_results", None)
        traceable = subs_traceable(sub_results)
        mask, _ = run_stage(
            "scan", table, build,
            extra_key=(self.predicate.key(),),
            cacheable=traceable or not self.uncorrelated_subquery_plans,
            params=self.parameters if self.parameters else None,
            subs=sub_results if traceable else None,
            used_cols=used_column_indices(cmap, [self.predicate]),
        )
        out = Table(table.column_names, table.columns, table.num_rows,
                    selection=mask)
        out.sorted_by = table.sorted_by
        return out

    def _describe_self(self) -> str:
        return f"TableScan({self.predicate.description()})"



"""Expression projection (ref: operators/projection.hpp:23 — evaluates an
expression list, forwarding input columns where possible)."""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp

from hyrise_tpu.expression import ast
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table


class Projection(AbstractReadOnlyOperator):
    def __init__(self, in_op, expressions: Sequence[ast.Expression],
                 names: Optional[Sequence[str]] = None):
        super().__init__(in_op)
        self.expressions = list(expressions)
        self.names = list(names) if names is not None else None
        self.output_expressions = list(expressions)

    def _on_execute(self) -> Table:
        from hyrise_tpu.operators.compiled import run_stage

        table = self.input_table_left()
        cmap = self._column_map(self._left)
        names = [
            self.names[i] if self.names is not None else e.name()
            for i, e in enumerate(self.expressions)
        ]
        computed = [e for e in self.expressions if e.key() not in cmap]

        if computed:
            def build(t: Table, bound=None, subs=None):
                ev = self.make_evaluator(t, cmap, parameters=bound,
                                         sub_results=subs)
                arrays = []
                meta = []
                for e in computed:
                    r = ev.evaluate(e)
                    data = r.data
                    if data.dtype == jnp.bool_:
                        data = data.astype(jnp.int32)
                    arrays.append((data, r.validity))
                    meta.append((r.dtype, r.dictionary, r.dict_sorted))
                return arrays, meta

            from hyrise_tpu.operators.compiled import (
                subs_traceable,
                used_column_indices,
            )

            sub_results = getattr(self, "_sub_results", None)
            traceable = subs_traceable(sub_results)
            arrays, meta = run_stage(
                "project", table, build,
                extra_key=tuple(e.key() for e in computed),
                cacheable=traceable or not self.uncorrelated_subquery_plans,
                params=self.parameters if self.parameters else None,
                subs=sub_results if traceable else None,
                used_cols=used_column_indices(cmap, computed),
            )
            computed_cols = {
                e.key(): Column(dtype, data, validity, dictionary, ds)
                for e, (data, validity), (dtype, dictionary, ds) in zip(
                    computed, arrays, meta
                )
            }
        else:
            computed_cols = {}

        columns = []
        for e in self.expressions:
            if e.key() in cmap:
                columns.append(table.columns[cmap[e.key()]])
            else:
                columns.append(computed_cols[e.key()])
        out = Table(names, columns, table.num_rows, selection=table.selection)
        return out

    def _describe_self(self) -> str:
        return "Projection(" + ", ".join(e.description() for e in self.expressions) + ")"

"""Index-assisted equi join (ref: operators/join_index.hpp:32): the build
side's sort is replaced by a prebuilt OrderedIndex (sorted projection), so
repeated joins against the same indexed table skip the O(n log n) device
sort each execution.  Falls back to the regular Join when no index fits.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.kernels import joins as joink
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.operators.joins import Join, JoinPredicate
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import JoinMode, size_bucket


class JoinIndex(AbstractReadOnlyOperator):
    """INNER/SEMI equi join probing an OrderedIndex on the right input's
    base table (right input must be the unfiltered stored table)."""

    def __init__(self, left_op, right_op, mode: JoinMode,
                 predicate: JoinPredicate, table_name: str, column_name: str):
        super().__init__(left_op, right_op)
        assert mode in (JoinMode.INNER, JoinMode.SEMI)
        self.mode = mode
        self.predicate = predicate
        self.table_name = table_name
        self.column_name = column_name
        self.output_expressions = (
            list(left_op.output_expressions)
            if mode == JoinMode.SEMI
            else list(left_op.output_expressions) + list(right_op.output_expressions)
        )

    def _index(self):
        registry = Database.get().index_registry
        idx = registry.ordered_index(self.table_name, self.column_name)
        if idx is None:
            base = Database.get().storage_manager.get_table(self.table_name)
            idx = registry.create_ordered_index(
                self.table_name, base, self.column_name
            )
        return idx

    def _on_execute(self) -> Table:
        L = self.input_table_left()
        R = self.input_table_right()
        idx = self._index()
        pev = self.make_evaluator(L, self._column_map(self._left))
        pr = pev.evaluate(self.predicate.left)
        pk = joink.normalize_key(pr.data).astype(idx.sorted_keys.dtype)
        pv = L.row_mask()
        if pr.validity is not None:
            pv = pv & pr.validity
        if self.mode == JoinMode.SEMI:
            member = joink.contains(idx.sorted_keys, idx.n_valid, pk, pv)
            return Table(L.column_names, L.columns, L.num_rows,
                         selection=member & pv)
        left_pos, counts = joink.probe_counts(
            idx.sorted_keys, idx.n_valid, pk, pv
        )
        total = int(joink.total_matches(counts))
        out_cap = size_bucket(total)
        probe_idx, build_idx, pair_valid = joink.expand_matches(
            left_pos, counts, idx.perm, out_cap
        )
        lt = L.take(probe_idx, out_cap)
        rt = R.take(build_idx, out_cap)
        return Table(
            L.column_names + R.column_names,
            lt.columns + rt.columns,
            out_cap,
            selection=pair_valid,
        )

    def _describe_self(self):
        return (f"JoinIndex({self.mode.value}, "
                f"{self.table_name}.{self.column_name})")

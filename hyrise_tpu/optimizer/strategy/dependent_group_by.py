"""Dependent group-by reduction (ref: optimizer/strategy/
dependent_group_by_reduction_rule.cpp): group-by columns functionally
determined by a declared unique key already in the group-by list are
removed from the grouping keys — they become representative-row outputs.

This both shrinks the sort width and frequently unlocks the dense-slot
grouping fast path (TPC-H Q10 reduces from 7 keys incl. strings to the
single int c_custkey).

Safety: only same-table dependencies under declared (soft) unique
constraints, and only when no outer join below can null-extend that
table's columns (NULL-keyed rows from different source rows would break
the dependency)."""

from __future__ import annotations

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import JoinMode

_OUTER_MODES = (JoinMode.LEFT, JoinMode.RIGHT, JoinMode.FULL)


class DependentGroupByReductionRule(AbstractRule):
    name = "DependentGroupByReduction"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        for node in root.walk():
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        self.apply(sub.lqp)
            if isinstance(node, L.AggregateNode) and len(node.group_by) > 1:
                self._reduce(node)
        return root

    def _reduce(self, agg: L.AggregateNode) -> None:
        if any(
            isinstance(n, L.JoinNode) and n.mode in _OUTER_MODES
            for n in agg.left.walk()
        ):
            return  # outer joins may null-extend; dependency unsafe
        # self-joins: ColumnRef.origin is the TABLE name, so two aliases
        # of the same table would be conflated into one dependency bucket
        # (c1.key "determining" c2's column from a DIFFERENT row) — skip
        # tables that appear more than once below the aggregate
        table_counts: dict = {}
        for n in agg.left.walk():
            if isinstance(n, L.StoredTableNode):
                table_counts[n.table_name] = table_counts.get(
                    n.table_name, 0) + 1
        cols = [
            e for e in agg.group_by
            if isinstance(e, ast.ColumnRef) and e.origin
            and table_counts.get(e.origin, 0) <= 1
        ]
        by_table = {}
        for c in cols:
            by_table.setdefault(c.origin, []).append(c)
        sm = Database.get().storage_manager
        determined = set()
        for origin, refs in by_table.items():
            try:
                table = sm.get_table(origin)
            except KeyError:
                continue
            names = {c.display_name for c in refs}
            for kc in table.key_constraints:
                key_set = set(kc.columns)
                if key_set <= names and key_set != names:
                    # the key determines this table's other grouped columns
                    for c in refs:
                        if c.display_name not in key_set:
                            determined.add(c.key())
                    break
        if not determined:
            return
        keep = [e for e in agg.group_by if e.key() not in determined]
        moved = [e for e in agg.group_by if e.key() in determined]
        agg.group_by = keep
        agg.dependent = agg.dependent + moved

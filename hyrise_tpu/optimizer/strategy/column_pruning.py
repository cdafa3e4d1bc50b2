"""Column pruning (ref: optimizer/strategy/column_pruning_rule.cpp):
stored-table scans drop columns never referenced above them — critical on
TPU where every surviving column is HBM traffic."""

from __future__ import annotations

from typing import Set

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L


class ColumnPruningRule(AbstractRule):
    name = "ColumnPruning"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        used: Set[tuple] = set()
        self._collect(root, used, is_root=True)
        for node in self._all_nodes(root):
            if isinstance(node, L.StoredTableNode):
                all_cols = node.all_columns()
                pruned = [
                    c.display_name for c in all_cols if c.key() not in used
                ]
                if len(pruned) == len(all_cols) and all_cols:
                    # bare COUNT(*): keep one column so the scan retains its
                    # row extent (a zero-column table has no capacity)
                    pruned = pruned[1:]
                node.pruned_column_names = pruned
        return root

    def _all_nodes(self, root):
        out = []
        stack = [root]
        while stack:
            n = stack.pop()
            out.append(n)
            stack.extend(n.inputs())
            for e in n.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        stack.append(sub.lqp)
        return out

    def _collect(self, root: L.LQPNode, used: Set[tuple], is_root: bool):
        # the plan's own output must survive
        for e in root.output_expressions():
            self._collect_expr(e, used)
        stack = [root]
        seen = set()
        while stack:
            node = stack.pop()
            if id(node) in seen:
                continue
            seen.add(id(node))
            for e in node.node_expressions():
                self._collect_expr(e, used)
            stack.extend(node.inputs())

    def _collect_expr(self, e: ast.Expression, used: Set[tuple]):
        for sub in e.walk():
            if isinstance(sub, ast.ColumnRef):
                used.add(sub.key())
            elif isinstance(sub, ast.Subquery):
                for _, outer in sub.parameters:
                    self._collect_expr(outer, used)
                self._collect(sub.lqp, used, is_root=False)

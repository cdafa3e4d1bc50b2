"""Predicate merging (ref: optimizer/strategy/predicate_merge_rule.cpp —
the reference merges scans to avoid re-materializing pos lists for
expensive predicates; here the payoff is larger: every PredicateNode is
one compiled device stage, and a fused conjunction evaluates all terms in
ONE stage with one dispatch — vectorized evaluation has no short-circuit
to preserve, so merging is strictly better).  Runs after placement and
reordering so pushdown decisions are already final."""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L


class PredicateMergeRule(AbstractRule):
    name = "PredicateMerge"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        def visit(node: L.LQPNode) -> L.LQPNode:
            if node.left is not None:
                node.left = visit(node.left)
            if node.right is not None:
                node.right = visit(node.right)
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        sub.lqp = self.apply(sub.lqp)
            if isinstance(node, L.PredicateNode):
                merged = node.predicate
                cursor = node.left
                while isinstance(cursor, L.PredicateNode) and not (
                    _has_subquery(cursor.predicate) or _has_subquery(merged)
                ):
                    merged = ast.Logical("and", merged, cursor.predicate)
                    cursor = cursor.left
                if cursor is not node.left:
                    return L.PredicateNode(merged, cursor)
            return node

        return visit(root)


def _has_subquery(e: ast.Expression) -> bool:
    return any(isinstance(s, ast.Subquery) for s in e.walk())

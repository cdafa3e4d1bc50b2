"""Null-scan removal (ref: optimizer/strategy/null_scan_removal_rule.cpp):
IS NOT NULL predicates on non-nullable columns are tautologies — drop the
scan node entirely."""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import PredicateCondition


class NullScanRemovalRule(AbstractRule):
    name = "NullScanRemoval"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        def visit(node: L.LQPNode) -> L.LQPNode:
            if node.left is not None:
                node.left = visit(node.left)
            if node.right is not None:
                node.right = visit(node.right)
            if isinstance(node, L.PredicateNode):
                p = node.predicate
                if (
                    isinstance(p, ast.Predicate)
                    and p.condition == PredicateCondition.IS_NOT_NULL
                    and isinstance(p.children[0], ast.ColumnRef)
                    and not p.children[0].nullable()
                    and not _null_extending_join_below(node.left)
                ):
                    return node.left
            return node

        return visit(root)


def _null_extending_join_below(node: L.LQPNode) -> bool:
    """Column nullability is a BASE-TABLE flag; an outer join below the
    predicate null-extends its columns, so the IS NOT NULL filter is NOT
    a tautology there (it rejects the unmatched rows)."""
    from hyrise_tpu.types import JoinMode

    return any(
        isinstance(n, L.JoinNode)
        and n.mode in (JoinMode.LEFT, JoinMode.RIGHT, JoinMode.FULL)
        for n in node.walk()
    )

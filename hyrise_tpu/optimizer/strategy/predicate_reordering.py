"""Predicate reordering (ref: optimizer/strategy/predicate_reordering_rule.cpp
orders scans by estimated selectivity).  Heuristic until the cardinality
estimator lands: predicates on dictionary/numeric equality first (most
selective), LIKE and subquery-ish predicates last."""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import PredicateCondition


def _cost_class(pred: ast.Expression) -> int:
    if isinstance(pred, ast.Predicate):
        if pred.condition == PredicateCondition.EQUALS:
            return 0
        if pred.condition in (
            PredicateCondition.BETWEEN_INCLUSIVE,
            PredicateCondition.BETWEEN_EXCLUSIVE,
            PredicateCondition.BETWEEN_LOWER_EXCLUSIVE,
            PredicateCondition.BETWEEN_UPPER_EXCLUSIVE,
        ):
            return 1
        if pred.condition in (PredicateCondition.LIKE, PredicateCondition.NOT_LIKE):
            return 3
        return 2
    if any(isinstance(s, ast.Subquery) for s in pred.walk()):
        return 5
    return 4


class PredicateReorderingRule(AbstractRule):
    name = "PredicateReordering"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        def visit(node: L.LQPNode) -> L.LQPNode:
            if node.left is not None:
                node.left = visit(node.left)
            if node.right is not None:
                node.right = visit(node.right)
            if isinstance(node, L.PredicateNode):
                # collect the maximal chain of PredicateNodes
                chain = [node]
                cursor = node.left
                while isinstance(cursor, L.PredicateNode):
                    chain.append(cursor)
                    cursor = cursor.left
                if len(chain) > 1:
                    chain.sort(key=lambda n: _cost_class(n.predicate))
                    # rebuild: most selective (lowest class) deepest, i.e.
                    # first in the chain to execute
                    bottom = cursor
                    for n in chain:
                        n.left = bottom
                        bottom = n
                    return bottom
            return node

        return visit(root)

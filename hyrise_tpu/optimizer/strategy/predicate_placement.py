"""Predicate pushdown (ref: optimizer/strategy/predicate_placement_rule.cpp):
push PredicateNodes as close to the storage leaves as semantics allow, so
scans shrink row counts before joins/aggregates/sorts."""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import JoinMode


class PredicatePlacementRule(AbstractRule):
    name = "PredicatePlacement"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        changed = True
        while changed:
            root, changed = self._push_once(root)
        # recurse into subquery plans
        for node in root.walk():
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        sub.lqp = self.apply(sub.lqp)
        return root

    def _push_once(self, root: L.LQPNode):
        """One pass; returns (new_root, changed)."""
        changed = [False]

        def visit(node: L.LQPNode) -> L.LQPNode:
            if node.left is not None:
                node.left = visit(node.left)
            if node.right is not None:
                node.right = visit(node.right)
            if isinstance(node, L.PredicateNode):
                replaced = self._try_push(node)
                if replaced is not node:
                    changed[0] = True
                    return visit(replaced)
            return node

        new_root = visit(root)
        return new_root, changed[0]

    def _try_push(self, pred_node: L.PredicateNode) -> L.LQPNode:
        child = pred_node.left
        pred = pred_node.predicate
        if _has_subquery(pred):
            return pred_node  # keep subquery predicates where they are
        refs = {c.key() for c in pred.referenced_columns()}

        if isinstance(child, (L.SortNode,)):
            # filter-then-sort == sort-then-filter (stable)
            pred_node.left = child.left
            child.left = pred_node
            return child
        if isinstance(child, L.ProjectionNode):
            below = {e.key() for e in child.left.output_expressions()}
            if _expr_available(pred, below):
                pred_node.left = child.left
                child.left = pred_node
                return child
            return pred_node
        if isinstance(child, L.AliasNode):
            below = {e.key() for e in child.left.output_expressions()}
            if _expr_available(pred, below):
                pred_node.left = child.left
                child.left = pred_node
                return child
            return pred_node
        if isinstance(child, L.AggregateNode):
            group_keys = {e.key() for e in child.group_by}
            if _expr_available(pred, group_keys):
                pred_node.left = child.left
                child.left = pred_node
                return child
            return pred_node
        if isinstance(child, L.JoinNode):
            left_cols = {e.key() for e in child.left.output_expressions()}
            right_cols = {e.key() for e in child.right.output_expressions()}
            can_left = _expr_available(pred, left_cols) and child.mode in (
                JoinMode.INNER, JoinMode.CROSS, JoinMode.LEFT, JoinMode.SEMI,
                JoinMode.ANTI_NULL_AS_TRUE, JoinMode.ANTI_NULL_AS_FALSE,
            )
            can_right = _expr_available(pred, right_cols) and child.mode in (
                JoinMode.INNER, JoinMode.CROSS, JoinMode.RIGHT,
            )
            if can_left:
                pred_node.left = child.left
                child.left = pred_node
                return child
            if can_right:
                pred_node.left = child.right
                child.right = pred_node
                return child
            return pred_node
        return pred_node


def _expr_available(pred: ast.Expression, below_keys) -> bool:
    """True if the predicate can be recomputed below: each sub-expression is
    either produced below verbatim (key match) or rebuildable from available
    children.  Aggregates/windows are only available verbatim."""
    if not pred.referenced_columns() and not any(
        isinstance(s, (ast.AggregateExpression, ast.WindowExpression))
        for s in pred.walk()
    ):
        return False

    def avail(e: ast.Expression) -> bool:
        if e.key() in below_keys:
            return True
        if isinstance(e, (ast.Literal, ast.Parameter, ast.IntervalLiteral)):
            return True
        if isinstance(e, (ast.ColumnRef, ast.AggregateExpression,
                          ast.WindowExpression, ast.Subquery)):
            return False
        return all(avail(c) for c in e.children)

    return avail(pred)


def _has_subquery(e: ast.Expression) -> bool:
    return any(isinstance(s, ast.Subquery) for s in e.walk())

"""Semi/anti join pushdown (ref: optimizer/strategy/
semi_join_reduction_rule.cpp — reduce join inputs early with semi joins).

A semi/anti join whose predicates only touch one side of the inner join
below it slides down onto that side, so the reduction happens before the
expensive join instead of after (TPC-H Q18: the orderkey semi filter moves
from above customer x orders x lineitem down onto orders)."""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import JoinMode

_SEMI_MODES = (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
               JoinMode.ANTI_NULL_AS_FALSE)


class SemiJoinReductionRule(AbstractRule):
    name = "SemiJoinReduction"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        # memoized by node identity: AggregateReductionRule introduces
        # DAGs (a subtree shared by two parents); every parent must
        # receive the SAME replacement or the second one is left pointing
        # at a node _push spliced deeper into the tree
        memo: dict = {}

        def visit(node: L.LQPNode) -> L.LQPNode:
            hit = memo.get(id(node))
            if hit is not None:
                return hit
            if node.left is not None:
                node.left = visit(node.left)
            if node.right is not None:
                node.right = visit(node.right)
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        sub.lqp = self.apply(sub.lqp)
            out = node
            if isinstance(node, L.JoinNode) and node.mode in _SEMI_MODES:
                out = self._push(node)
            memo[id(node)] = out
            return out

        return visit(root)

    def _push(self, semi: L.JoinNode) -> L.LQPNode:
        refs = {
            c.key()
            for p in semi.predicates
            for c in p.children[0].referenced_columns()
        }
        if not refs:
            return semi
        top: L.LQPNode = semi
        parent: L.LQPNode = None
        parent_side = "left"
        while True:
            child = semi.left
            target_side = None
            if isinstance(child, L.JoinNode) and child.mode in (
                JoinMode.INNER, JoinMode.CROSS
            ):
                left_cols = {e.key() for e in child.left.output_expressions()}
                right_cols = {e.key() for e in child.right.output_expressions()}
                if refs <= left_cols:
                    target_side = "left"
                elif refs <= right_cols:
                    target_side = "right"
            if target_side is None:
                break
            # semi's slot in the tree is taken over by child; semi dives in
            if parent is None:
                top = child
            else:
                setattr(parent, parent_side, child)
            semi.left = getattr(child, target_side)
            setattr(child, target_side, semi)
            parent, parent_side = child, target_side
        return top

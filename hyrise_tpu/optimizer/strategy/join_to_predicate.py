"""Join-to-predicate rewrite (ref: optimizer/strategy/
join_to_predicate_rewrite_rule.cpp): a semi join whose build side is
filtered down to AT MOST ONE row — an equality on a column the soft key
constraints declare unique — is just a scalar filter.  Rewrite

    SemiJoin(l.k = r.k, left, Filter(r.u = const, R))
 -> Predicate(l.k = (SELECT r.k FROM R WHERE r.u = const), left)

On the TPU path this removes the join's sorted-build + probe stage and
its table-signature coupling; the scalar subquery materializes once and
the probe becomes a fused compare inside the scan stage."""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.optimizer.strategy.join_to_semi_join import _key_unique_below
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import JoinMode, PredicateCondition


def _single_row_filter(right: L.LQPNode) -> bool:
    """True when `right` is a linear chain over one stored table whose
    predicates include an equality on a declared-unique column."""
    node = right
    found = False
    while node is not None:
        if isinstance(node, (L.ValidateNode, L.ProjectionNode, L.AliasNode,
                             L.SortNode)):
            node = node.left
            continue
        if isinstance(node, L.PredicateNode):
            p = node.predicate
            if (isinstance(p, ast.Predicate)
                    and p.condition == PredicateCondition.EQUALS
                    and len(p.children) == 2
                    and isinstance(p.children[0], ast.ColumnRef)
                    and isinstance(p.children[1], ast.Literal)
                    and _key_unique_below(node.left, p.children[0])):
                found = True
            node = node.left
            continue
        if isinstance(node, L.StoredTableNode):
            return found
        return False
    return False


class JoinToPredicateRewriteRule(AbstractRule):
    name = "JoinToPredicateRewrite"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        def visit(node: L.LQPNode) -> L.LQPNode:
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        sub.lqp = self.apply(sub.lqp)
            if node.left is not None:
                node.left = visit(node.left)
            if node.right is not None:
                node.right = visit(node.right)
            if (isinstance(node, L.JoinNode)
                    and node.mode == JoinMode.SEMI
                    and len(node.predicates) == 1):
                rewritten = self._rewrite(node)
                if rewritten is not None:
                    return rewritten
            return node

        return visit(root)

    def _rewrite(self, join: L.JoinNode):
        pred = join.predicates[0]
        if pred.condition != PredicateCondition.EQUALS:
            return None
        lhs, rhs = pred.children
        if not (isinstance(lhs, ast.ColumnRef) and isinstance(rhs, ast.ColumnRef)):
            return None
        left_cols = {e.key() for e in join.left.output_expressions()}
        right_cols = {e.key() for e in join.right.output_expressions()}
        if lhs.key() in right_cols and rhs.key() in left_cols:
            lhs, rhs = rhs, lhs
        if not (lhs.key() in left_cols and rhs.key() in right_cols):
            return None
        if not _single_row_filter(join.right):
            return None
        sub_lqp = L.ProjectionNode([rhs], join.right)
        return L.PredicateNode(
            ast.Predicate(
                PredicateCondition.EQUALS, [lhs, ast.Subquery(sub_lqp)]
            ),
            join.left,
        )

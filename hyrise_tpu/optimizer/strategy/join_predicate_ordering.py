"""Join predicate ordering (ref: optimizer/strategy/
join_predicate_ordering_rule.cpp): order each JoinNode's predicates so the
most selective equality (highest distinct count) is the primary join key —
the primary drives the sorted-probe expansion bound, so a low-ndv primary
(e.g. suppkey when orderkey is available) explodes the pair count."""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.statistics.cardinality import CardinalityEstimator
from hyrise_tpu.types import PredicateCondition


class JoinPredicateOrderingRule(AbstractRule):
    name = "JoinPredicateOrdering"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        est = CardinalityEstimator()
        for node in root.walk():
            if isinstance(node, L.JoinNode) and len(node.predicates) > 1:
                node.predicates.sort(key=lambda p: -_pred_ndv(p, est))
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        self.apply(sub.lqp)
        return root


def _pred_ndv(p: ast.Expression, est: CardinalityEstimator) -> float:
    if not (
        isinstance(p, ast.Predicate)
        and p.condition == PredicateCondition.EQUALS
        and len(p.children) == 2
    ):
        return -1.0  # non-equi predicates order last
    big = 1e18
    nds = []
    for c in p.children:
        cs = est.column_stats(c) if isinstance(c, ast.ColumnRef) else None
        if cs is not None:
            nds.append(cs.distinct_count)
    return max(nds) if nds else big / 2  # unknown: assume selective

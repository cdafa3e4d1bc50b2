"""Logical cost model (ref: cost_estimation/cost_estimator_logical.cpp —
cost derived from cardinality estimates).

On TPU the operator cost model differs from the reference's per-row CPU
costs: device stages are bandwidth-bound and sort-dominated, and every
host sync has a fixed latency floor.  The model prices a plan as

    cost = sum over nodes of (rows_in * op_factor) + syncs * SYNC_COST

which is what the join-ordering DP minimizes (intermediate cardinality
sums approximate the same quantity).
"""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.statistics.cardinality import CardinalityEstimator
from hyrise_tpu.types import JoinMode

# relative per-row factors (bandwidth-normalized)
SCAN_FACTOR = 1.0
JOIN_FACTOR = 6.0      # sort + binary search + expansion gathers
AGG_SORT_FACTOR = 8.0  # lexicographic sort dominates
AGG_DENSE_FACTOR = 1.5
SORT_FACTOR = 8.0
SYNC_COST = 50_000.0   # host-sync latency floor expressed in row-equivalents


class CostEstimator:
    def __init__(self, cardinality: CardinalityEstimator = None):
        self.card = cardinality or CardinalityEstimator()

    def estimate_plan_cost(self, root: L.LQPNode) -> float:
        total = 0.0
        for node in root.walk():
            total += self._node_cost(node)
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        total += self.estimate_plan_cost(sub.lqp)
        return total

    def _node_cost(self, node: L.LQPNode) -> float:
        rows_in = self.card.estimate(node.left) if node.left else 0.0
        t = type(node)
        if t is L.PredicateNode:
            return rows_in * SCAN_FACTOR
        if t is L.JoinNode:
            r = self.card.estimate(node.right) if node.right else 0.0
            out = self.card.estimate(node)
            if node.mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
                             JoinMode.ANTI_NULL_AS_FALSE):
                return (rows_in + r) * JOIN_FACTOR
            return (rows_in + r + out) * JOIN_FACTOR + SYNC_COST
        if t is L.AggregateNode:
            return rows_in * AGG_SORT_FACTOR + (
                SYNC_COST if node.group_by else 0.0
            )
        if t is L.SortNode:
            return rows_in * SORT_FACTOR
        if t in (L.ProjectionNode, L.AliasNode, L.LimitNode):
            return rows_in * 0.2
        if t in (L.UnionNode, L.IntersectNode, L.ExceptNode, L.DistinctNode):
            return rows_in * AGG_SORT_FACTOR
        return 0.0

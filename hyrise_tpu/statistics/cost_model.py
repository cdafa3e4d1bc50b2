"""Logical cost model (ref: cost_estimation/cost_estimator_logical.cpp —
cost derived from cardinality estimates; consumed by join ordering the way
the reference's DpCcp/GreedyOperatorOrdering take an AbstractCostEstimator).

The reference prices a node from (left_rows, right_rows, output_rows):
    join:      l + r + out
    sort:      l*log(l) + out
    predicate: l * expression_cost_multiplier(pred) + out
    union(pos): l*log(l) + r*log(r) + out
    default:   l + out
(cost_estimator_logical.cpp:79-127).  On TPU the same quantities hold —
l + r is the HBM traffic of build+probe, out the expansion writes — with
two accelerator-specific additions: a fixed host-sync latency floor per
non-unique join (the expansion-size sync costs a tunnel RTT regardless of
rows) and a sort-heavy aggregate factor (grouping is lexicographic-sort
based when the dense-slot domain is unavailable).
"""

from __future__ import annotations

import math

from hyrise_tpu.expression import ast
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.statistics.cardinality import CardinalityEstimator
from hyrise_tpu.types import JoinMode

# Host-sync latency floor in row-equivalents (a ~28ms tunnel RTT at the
# ~GB/s scan rate prices like scanning ~50k rows).  Constant per join, so
# it cancels between orderings of the same join count; it matters when
# comparing plans with different join counts (e.g. semi-join reductions).
SYNC_COST = 50_000.0


def expression_cost_multiplier(expression: ast.Expression) -> float:
    """Number of column streams a predicate reads (+1 per correlated
    subquery parameter), floored at 1 for tautologies — the reference's
    multiplier exactly (cost_estimator_logical.cpp:23-68).  On TPU a fused
    scan's cost scales with the HBM streams it touches, which is the same
    count."""
    multiplier = 0.0
    for sub in expression.walk():
        if isinstance(sub, ast.ColumnRef):
            multiplier += 1.0
        elif isinstance(sub, ast.Subquery) and sub.is_correlated():
            multiplier += 1.0
    return max(1.0, multiplier)


def _xlogx(n: float) -> float:
    return n * math.log(n) if n > 1.0 else 0.0


class CostEstimator:
    """Plan cost = sum of per-node logical costs (cardinality-derived)."""

    def __init__(self, cardinality: CardinalityEstimator = None):
        self.card = cardinality or CardinalityEstimator()

    # ------------------------------------------------------------- plans

    def estimate_plan_cost(self, root: L.LQPNode) -> float:
        total = 0.0
        for node in root.walk():
            total += self._node_cost(node)
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        total += self.estimate_plan_cost(sub.lqp)
        return total

    # ------------------------------------------------------- join ordering

    def join_cost(self, left_rows: float, right_rows: float,
                  out_rows: float) -> float:
        """Incremental cost of one join step given already-estimated
        cardinalities — the quantity the join-ordering DP/greedy minimizes
        (ref: join cost l + r + out, cost_estimator_logical.cpp:90-93)."""
        return left_rows + right_rows + out_rows

    def predicate_cost(self, rows_in: float, predicate: ast.Expression,
                       out_rows: float) -> float:
        """Incremental cost of a post-join filter inside an ordering search
        (ref: cost_estimator_logical.cpp:119-123)."""
        return rows_in * expression_cost_multiplier(predicate) + out_rows

    # ------------------------------------------------------------- nodes

    def _node_cost(self, node: L.LQPNode) -> float:
        rows_in = self.card.estimate(node.left) if node.left else 0.0
        out = self.card.estimate(node)
        t = type(node)
        if t is L.PredicateNode:
            return self.predicate_cost(rows_in, node.predicate, out)
        if t is L.JoinNode:
            r = self.card.estimate(node.right) if node.right else 0.0
            cost = self.join_cost(rows_in, r, out)
            if node.mode not in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
                                 JoinMode.ANTI_NULL_AS_FALSE):
                cost += SYNC_COST  # expansion-size host sync
            return cost
        if t is L.SortNode:
            return _xlogx(rows_in) + out
        if t is L.AggregateNode:
            # sort-based grouping unless dense; group-count sync when grouped
            return _xlogx(rows_in) + out + (SYNC_COST if node.group_by else 0.0)
        if t in (L.UnionNode, L.IntersectNode, L.ExceptNode, L.DistinctNode):
            r = self.card.estimate(node.right) if node.right else 0.0
            return _xlogx(rows_in) + _xlogx(r) + out
        if t in (L.StoredTableNode, L.StaticTableNode):
            return 0.0
        if t in (L.ProjectionNode, L.AliasNode, L.LimitNode):
            return rows_in + out
        return rows_in + out

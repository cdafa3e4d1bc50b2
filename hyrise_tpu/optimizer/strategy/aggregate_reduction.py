"""Aggregate input reduction: semi-join-reduce a grouped aggregate's input
by the keys of a selective inner-join partner (ref: optimizer/strategy/
semi_join_reduction_rule.cpp — the reference synthesizes semi-join reducers
from inner-join predicates; here the reducer lands BELOW a grouped
aggregate that feeds the join, the shape decorrelated scalar-aggregate
subqueries produce: TPC-H Q17/Q2 aggregate a full fact table only to
inner-join the result against a few hundred filtered keys).

Validity: for an INNER equi-join on a subset of the aggregate's group-by
keys, only groups whose key appears on the partner side survive the join.
A group's aggregate value depends only on that group's own input rows, so
semi-filtering the aggregate INPUT by the partner's keys preserves every
surviving group's value (whole groups survive or die — never partially).
Interposed Alias/Projection/Predicate/Sort nodes between join and
aggregate are transparent: a HAVING-style predicate only removes further
groups, and groups removed by the reducer could never satisfy the join.

The partner subtree is SHARED (DAG) with the reducer's build side; the
LQP translator memoizes physical operators by node identity, so the
partner executes exactly once.
"""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.statistics.cardinality import CardinalityEstimator
from hyrise_tpu.types import JoinMode, PredicateCondition

class AggregateReductionRule(AbstractRule):
    name = "AggregateReduction"

    #: the partner side must be at least this many times smaller than the
    #: aggregate's input for the reducer semi join to pay for itself
    FACTOR = 16

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        est = CardinalityEstimator()

        def visit(node: L.LQPNode) -> L.LQPNode:
            if node.left is not None:
                node.left = visit(node.left)
            if node.right is not None:
                node.right = visit(node.right)
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        sub.lqp = self.apply(sub.lqp)
            if isinstance(node, L.JoinNode) and node.mode == JoinMode.INNER:
                self._try_reduce(node, est)
            return node

        return visit(root)

    # ------------------------------------------------------------------

    def _find_agg(self, node: L.LQPNode):
        """Walk a single-child chain of row-preserving / group-preserving
        nodes down to a grouped AggregateNode (Limit would change WHICH
        groups exist, so it stops the walk)."""
        while isinstance(
            node, (L.AliasNode, L.ProjectionNode, L.PredicateNode, L.SortNode)
        ):
            node = node.left
        if isinstance(node, L.AggregateNode) and node.group_by:
            return node
        return None

    def _try_reduce(self, join: L.JoinNode, est: CardinalityEstimator):
        for agg_side, other_side in (("left", "right"), ("right", "left")):
            agg = self._find_agg(getattr(join, agg_side))
            if agg is None or getattr(agg, "_input_reduced", False):
                continue
            other = getattr(join, other_side)
            group_keys = {
                g.key() for g in list(agg.group_by) + list(agg.dependent)
            }
            below_keys = {e.key() for e in agg.left.output_expressions()}
            other_keys = {e.key() for e in other.output_expressions()}
            if other_keys & below_keys:
                # the partner overlaps the aggregate's own input (same
                # table reached via another join path) — a semi join
                # between them could not separate sides
                continue
            reducer_preds = []
            key_ratio = 1.0
            rows_in = est.estimate(agg.left)
            rows_other = est.estimate(other)
            for p in join.predicates:
                if not (
                    isinstance(p, ast.Predicate)
                    and p.condition == PredicateCondition.EQUALS
                    and len(p.children) == 2
                ):
                    continue
                a, b = p.children
                for agg_expr, other_expr in ((a, b), (b, a)):
                    if (
                        agg_expr.key() in group_keys
                        and agg_expr.key() in below_keys
                        and other_expr.key() in other_keys
                    ):
                        reducer_preds.append(ast.eq(agg_expr, other_expr))
                        ndv_in = est.distinct_count(agg_expr, rows_in)
                        ndv_other = est.distinct_count(
                            other_expr, rows_other
                        )
                        if ndv_in > 0:
                            key_ratio = min(key_ratio, ndv_other / ndv_in)
                        break
            if not reducer_preds:
                continue
            if rows_other * self.FACTOR > rows_in:
                continue
            if key_ratio * self.FACTOR > 1.0:
                # the partner covers (most of) the aggregate's key domain
                # (SF1 Q15: the full supplier table joins the per-supplier
                # revenue aggregate — a semi by its keys filters nothing
                # and cost 780 ms of pure overhead)
                continue
            agg.left = L.JoinNode(
                JoinMode.SEMI, reducer_preds, agg.left, other
            )
            agg._input_reduced = True  # type: ignore[attr-defined]
            return

"""Join ordering (ref: optimizer/join_ordering/ — JoinGraph/
JoinGraphBuilder + DpCcp below a size threshold, GreedyOperatorOrdering
above; join_ordering_rule.hpp:20-24).

Collects maximal regions of inner/cross joins + predicates into a join
graph, then builds a left-deep tree greedily: start from the smallest
vertex, repeatedly attach the connected vertex with the smallest estimated
join result.  This also converts comma-style FROM lists (cross joins +
WHERE equalities) into proper equi joins — essential on TPU where a cross
product materializes |L|x|R| rows.  Size estimates use base-table row
counts with crude selectivity factors until the histogram-based
cardinality estimator supersedes them.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import JoinMode, PredicateCondition


class JoinOrderingRule(AbstractRule):
    name = "JoinOrdering"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        def visit(node: L.LQPNode) -> L.LQPNode:
            # first, recurse into subquery plans
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        sub.lqp = self.apply(sub.lqp)
            if _is_region_node(node):
                rebuilt = self._rebuild_region(node, visit)
                return rebuilt
            if node.left is not None:
                node.left = visit(node.left)
            if node.right is not None:
                node.right = visit(node.right)
            return node

        return visit(root)

    # ------------------------------------------------------------------

    def _rebuild_region(self, region_root: L.LQPNode, visit) -> L.LQPNode:
        vertices: List[L.LQPNode] = []
        predicates: List[ast.Expression] = []
        subquery_predicates: List[ast.Expression] = []

        def order_subplans(e: ast.Expression):
            # interior predicates skip visit(), so their subquery plans
            # must receive join ordering here (they may contain comma-join
            # chains of their own)
            for sub in e.walk():
                if isinstance(sub, ast.Subquery):
                    sub.lqp = self.apply(sub.lqp)

        def collect(node: L.LQPNode):
            if isinstance(node, L.PredicateNode):
                # subquery-bearing predicates hoist above the region
                # (filters commute with inner/cross joins)
                if _has_subquery(node.predicate):
                    order_subplans(node.predicate)
                    subquery_predicates.append(node.predicate)
                else:
                    predicates.append(node.predicate)
                collect(node.left)
            elif isinstance(node, L.JoinNode) and node.mode in (
                JoinMode.INNER, JoinMode.CROSS
            ):
                for p in node.predicates:
                    order_subplans(p)
                predicates.extend(node.predicates)
                collect(node.left)
                collect(node.right)
            else:
                vertices.append(visit(node))  # recurse inside the vertex

        collect(region_root)
        predicates_tail = subquery_predicates

        if len(vertices) == 1:
            out = vertices[0]
            for p in reversed(predicates):
                out = L.PredicateNode(p, out)
            for p in predicates_tail:
                out = L.PredicateNode(p, out)
            return out

        from hyrise_tpu.statistics.cardinality import CardinalityEstimator
        from hyrise_tpu.statistics.cost_model import CostEstimator

        est = CardinalityEstimator()
        cost_est = CostEstimator(est)
        vert_cols: List[Set[tuple]] = [
            {e.key() for e in v.output_expressions()} for v in vertices
        ]

        # local predicates (single vertex) apply directly to that vertex
        remaining: List[ast.Expression] = []
        for p in predicates:
            refs = {c.key() for c in p.referenced_columns()}
            placed = False
            if refs:
                for i, cols in enumerate(vert_cols):
                    if refs <= cols:
                        vertices[i] = L.PredicateNode(p, vertices[i])
                        placed = True
                        break
            if not placed:
                remaining.append(p)
        sizes = [est.estimate(v) for v in vertices]

        # exact DP below the threshold (ref: join_ordering_rule.hpp:20-24 —
        # DpCcp under a size limit, greedy above)
        if 2 <= len(vertices) <= DP_MAX_VERTICES:
            dp_result = _dp_join_order(
                vertices, vert_cols, sizes, remaining, est, cost_est
            )
            if dp_result is not None:
                current, leftover = dp_result
                for p in leftover:
                    current = L.PredicateNode(p, current)
                for p in predicates_tail:
                    current = L.PredicateNode(p, current)
                return current

        # greedy left-deep build
        unused = set(range(len(vertices)))
        start = min(unused, key=lambda i: sizes[i])
        unused.discard(start)
        current = vertices[start]
        current_cols = set(vert_cols[start])
        current_size = sizes[start]

        while unused:
            best = None
            best_cost = None
            for i in unused:
                join_preds = [
                    p for p in remaining
                    if _joins(p, current_cols, vert_cols[i])
                    and _separates(p, current_cols, vert_cols[i])
                ]
                if join_preds:
                    out = est.join_output_rows(current_size, sizes[i], join_preds)
                else:
                    out = current_size * sizes[i]
                cost = cost_est.join_cost(current_size, sizes[i], out)
                if best_cost is None or cost < best_cost:
                    best_cost = cost
                    best = i
                    best_out = out
            i = best
            unused.discard(i)
            join_preds = [
                p for p in remaining
                if _joins(p, current_cols, vert_cols[i])
                and _separates(p, current_cols, vert_cols[i])
            ]
            for p in join_preds:
                remaining.remove(p)
            new_cols = current_cols | vert_cols[i]
            if join_preds:
                current = L.JoinNode(JoinMode.INNER, join_preds, current,
                                     vertices[i])
            else:
                current = L.JoinNode(JoinMode.CROSS, [], current, vertices[i])
            current_cols = new_cols
            current_size = max(best_out, 1.0)
            # predicates that became evaluable only with the merged set
            for p in list(remaining):
                refs = {c.key() for c in p.referenced_columns()}
                if refs and refs <= current_cols:
                    current = L.PredicateNode(p, current)
                    current_size = max(
                        current_size * est.predicate_selectivity(p, current_size),
                        1.0,
                    )
                    remaining.remove(p)

        for p in remaining:
            current = L.PredicateNode(p, current)
        for p in predicates_tail:  # subquery-bearing predicates on top
            current = L.PredicateNode(p, current)
        return current


DP_MAX_VERTICES = 10


def _dp_join_order(vertices, vert_cols, sizes, preds, est, cost_est):
    """Optimal bushy join order via DP over vertex subsets (the DpCcp
    equivalent; ref: optimizer/join_ordering/dp_ccp.hpp:26).  Cost = the
    logical cost model's per-node cost summed over the subtree
    (statistics/cost_model.py; ref: DpCcp minimizing an
    AbstractCostEstimator's plan cost).  Returns (plan, leftover_preds)
    or None when the graph is disconnected (greedy handles cross joins)."""
    n = len(vertices)
    full = (1 << n) - 1

    def subset_cols(mask):
        cols = set()
        for i in range(n):
            if mask & (1 << i):
                cols |= vert_cols[i]
        return cols

    cols_of = {1 << i: set(vert_cols[i]) for i in range(n)}

    def get_cols(mask):
        if mask not in cols_of:
            low = mask & -mask
            cols_of[mask] = get_cols(low) | get_cols(mask ^ low)
        return cols_of[mask]

    # (rows, cost, plan, applied_pred_ids)
    best = {}
    for i in range(n):
        best[1 << i] = (sizes[i], 0.0, vertices[i], frozenset())

    pred_refs = []
    for p in preds:
        pred_refs.append({c.key() for c in p.referenced_columns()})

    for mask in range(3, full + 1):
        if bin(mask).count("1") < 2:
            continue
        entry = None
        # enumerate proper subset splits (s, mask^s); s < mask^s to halve
        s = (mask - 1) & mask
        while s:
            c = mask ^ s
            if s < c:
                pair = (s, c)
            else:
                pair = (c, s)
            s = (s - 1) & mask
            a, b = pair
            if a not in best or b not in best:
                continue
            ra, ca, pa, applied_a = best[a]
            rb, cb, pb, applied_b = best[b]
            cols_a = get_cols(a)
            cols_b = get_cols(b)
            join_pred_ids = [
                i for i, p in enumerate(preds)
                if i not in applied_a and i not in applied_b
                and pred_refs[i]
                and pred_refs[i] <= (cols_a | cols_b)
                and (pred_refs[i] & cols_a) and (pred_refs[i] & cols_b)
                and _separates(p, cols_a, cols_b)
            ]
            if not join_pred_ids:
                continue  # no cross products inside DP
            join_preds = [preds[i] for i in join_pred_ids]
            rows = est.join_output_rows(ra, rb, join_preds)
            applied = applied_a | applied_b | set(join_pred_ids)
            plan = L.JoinNode(JoinMode.INNER, join_preds, pa, pb)
            step_cost = cost_est.join_cost(ra, rb, rows)
            # apply newly-covered non-separable predicates
            extra = [
                i for i, p in enumerate(preds)
                if i not in applied and pred_refs[i]
                and pred_refs[i] <= (cols_a | cols_b)
            ]
            for i in extra:
                plan = L.PredicateNode(preds[i], plan)
                rows_out = max(
                    rows * est.predicate_selectivity(preds[i], rows), 1.0
                )
                step_cost += cost_est.predicate_cost(rows, preds[i], rows_out)
                rows = rows_out
                applied = applied | {i}
            cost = ca + cb + step_cost
            if entry is None or cost < entry[1]:
                entry = (rows, cost, plan, frozenset(applied))
        if entry is not None:
            best[mask] = entry

    if full not in best:
        return None  # disconnected join graph
    rows, cost, plan, applied = best[full]
    leftover = [p for i, p in enumerate(preds) if i not in applied]
    return plan, leftover


def _is_region_node(node: L.LQPNode) -> bool:
    """A region is rooted at an inner/cross JoinNode, or a PredicateNode
    chain leading to one."""
    cursor = node
    while isinstance(cursor, L.PredicateNode):
        cursor = cursor.left
    return isinstance(cursor, L.JoinNode) and cursor.mode in (
        JoinMode.INNER, JoinMode.CROSS
    )


def _joins(p: ast.Expression, left_cols: Set[tuple], right_cols: Set[tuple]) -> bool:
    refs = {c.key() for c in p.referenced_columns()}
    if not refs or not refs <= (left_cols | right_cols):
        return False
    return bool(refs & left_cols) and bool(refs & right_cols)


def _separates(p: ast.Expression, left_cols: Set[tuple],
               right_cols: Set[tuple]) -> bool:
    """True if p is a binary comparison with one operand per side — the
    only shape the Join operator takes as a join predicate; anything else
    (e.g. OR-of-conjunctions spanning both sides) becomes a post-join
    PredicateNode."""
    if not isinstance(p, ast.Predicate) or len(p.children) != 2:
        return False
    a, b = p.children
    ar = {c.key() for c in a.referenced_columns()}
    br = {c.key() for c in b.referenced_columns()}
    if not ar or not br:
        return False
    return (ar <= left_cols and br <= right_cols) or (
        ar <= right_cols and br <= left_cols
    )


def _is_equi(p: ast.Expression) -> bool:
    return (
        isinstance(p, ast.Predicate)
        and p.condition == PredicateCondition.EQUALS
        and len(p.children) == 2
    )


def _has_subquery(e: ast.Expression) -> bool:
    return any(isinstance(s, ast.Subquery) for s in e.walk())


def _selectivity(p: ast.Expression) -> float:
    if isinstance(p, ast.Predicate):
        if p.condition == PredicateCondition.EQUALS:
            return 0.05
        if p.condition in (PredicateCondition.LIKE, PredicateCondition.NOT_LIKE):
            return 0.2
        return 0.3
    return 0.5


def _estimate_rows(node: L.LQPNode) -> int:
    """Crude bottom-up row estimate (superseded by statistics/)."""
    if isinstance(node, L.StoredTableNode):
        try:
            return max(
                Database.get().storage_manager.get_table(node.table_name).num_rows,
                1,
            )
        except KeyError:
            return 1000
    if isinstance(node, L.StaticTableNode):
        return max(node.table.num_rows, 1)
    if isinstance(node, L.PredicateNode):
        return max(1, int(_estimate_rows(node.left) * _selectivity(node.predicate)))
    if isinstance(node, L.AggregateNode):
        base = _estimate_rows(node.left)
        return max(1, base // 10) if node.group_by else 1
    if isinstance(node, L.JoinNode):
        l = _estimate_rows(node.left)
        if node.mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
                         JoinMode.ANTI_NULL_AS_FALSE):
            return max(1, l // 2)
        r = _estimate_rows(node.right) if node.right else 1
        if node.mode == JoinMode.CROSS:
            return l * r
        return max(l, r)
    if isinstance(node, L.LimitNode):
        try:
            return min(_estimate_rows(node.left), node.row_count.value)
        except Exception:
            return _estimate_rows(node.left)
    if node.left is not None:
        return _estimate_rows(node.left)
    return 1

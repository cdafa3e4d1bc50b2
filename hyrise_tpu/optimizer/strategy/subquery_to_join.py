"""Subquery unnesting (ref: optimizer/strategy/subquery_to_join_rule.cpp):

- (NOT) IN (uncorrelated subquery)     -> semi / anti-null-as-true join
- (NOT) EXISTS (correlated subquery)   -> semi / anti-null-as-false join,
  hoisting `inner_col = outer_param` equality predicates to join predicates
- (NOT) IN (correlated subquery)       -> same + operand equality predicate
- cmp with correlated scalar aggregate -> inner join against the aggregate
  grouped by the correlation columns (covers TPC-H Q2/Q17-style patterns)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import JoinMode, PredicateCondition


class SubqueryToJoinRule(AbstractRule):
    name = "SubqueryToJoin"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        def visit(node: L.LQPNode) -> L.LQPNode:
            if node.left is not None:
                node.left = visit(node.left)
            if node.right is not None:
                node.right = visit(node.right)
            # recurse into any remaining subquery plans first
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        sub.lqp = self.apply(sub.lqp)
            if isinstance(node, L.PredicateNode):
                rewritten = self._rewrite_predicate(node)
                if rewritten is not None:
                    return visit(rewritten)
            return node

        return visit(root)

    # ------------------------------------------------------------------

    def _rewrite_predicate(self, node: L.PredicateNode) -> Optional[L.LQPNode]:
        pred = node.predicate
        if isinstance(pred, ast.InSubquery):
            return self._rewrite_in(node, pred, pred.negated)
        if isinstance(pred, ast.Exists):
            return self._rewrite_exists(node, pred)
        if isinstance(pred, ast.Not) and isinstance(pred.children[0], ast.Exists):
            inner = pred.children[0]
            return self._rewrite_exists(
                node, ast.Exists(inner.subquery, not inner.negated)
            )
        if isinstance(pred, ast.Predicate) and len(pred.children) == 2:
            l, r = pred.children
            if isinstance(r, ast.Subquery) and r.is_correlated():
                return self._rewrite_correlated_scalar(node, pred, l, r)
            if isinstance(l, ast.Subquery) and l.is_correlated():
                from hyrise_tpu.types import FLIPPED_CONDITION

                flipped = FLIPPED_CONDITION.get(pred.condition)
                if flipped is None:
                    return None
                return self._rewrite_correlated_scalar(
                    node, ast.Predicate(flipped, [r, l]), r, l
                )
        if isinstance(pred, (ast.Logical, ast.Not)):
            return self._rewrite_marked(node)
        return None

    # ------------------------------------------------------------------

    def _rewrite_marked(self, node: L.PredicateNode) -> Optional[L.LQPNode]:
        """Correlated EXISTS inside a boolean tree (OR branches, NOT —
        TPC-DS Q10/Q35/Q69): rewrite each as a MARK join — LEFT join the
        outer input against the DISTINCT correlation keys of the subquery
        and replace the EXISTS with `key IS [NOT] NULL`.  IS NULL is
        2-valued, so the marker composes under any NOT/OR context."""
        pred = node.predicate
        exists_nodes: List[ast.Exists] = []

        def scan(e: ast.Expression) -> bool:
            """Collect correlated EXISTS; False when one sits under an
            operator other than AND/OR/NOT (no safe mark placement)."""
            if isinstance(e, ast.Exists):
                if e.subquery.is_correlated():
                    exists_nodes.append(e)
                return True
            if isinstance(e, (ast.Logical, ast.Not)):
                return all(scan(c) for c in e.children)
            return not any(
                isinstance(s, ast.Exists) and s.subquery.is_correlated()
                for s in e.walk()
            )

        if not scan(pred) or not exists_nodes:
            return None

        target = node.left
        mapping: Dict[int, ast.Expression] = {}
        for ex in exists_nodes:
            inner, hoisted = self._hoist_correlation(ex.subquery)
            if not hoisted:
                return None
            if not all(
                isinstance(hp, ast.Predicate)
                and hp.condition == PredicateCondition.EQUALS
                for hp in hoisted
            ):
                return None  # distinct-key dedup needs pure equalities
            corr_cols = [hp.children[1] for hp in hoisted]
            distinct = L.AggregateNode(corr_cols, [], inner)
            target = L.JoinNode(JoinMode.LEFT, list(hoisted), target, distinct)
            cond = (PredicateCondition.IS_NULL if ex.negated
                    else PredicateCondition.IS_NOT_NULL)
            mapping[id(ex)] = ast.Predicate(cond, [corr_cols[0]])

        def rebuild(e: ast.Expression) -> ast.Expression:
            if id(e) in mapping:
                return mapping[id(e)]
            if isinstance(e, ast.Logical):
                return ast.Logical(e.op, rebuild(e.children[0]),
                                   rebuild(e.children[1]))
            if isinstance(e, ast.Not):
                return ast.Not(rebuild(e.children[0]))
            return e

        return L.PredicateNode(rebuild(pred), target)

    def _rewrite_in(self, node, pred: ast.InSubquery, negated: bool):
        sub: ast.Subquery = pred.subquery
        sub_cols = sub.lqp.output_expressions()
        if len(sub_cols) != 1:
            return None
        join_preds = [ast.eq(pred.operand, sub_cols[0])]
        inner, hoisted = self._hoist_correlation(sub)
        if hoisted is None:
            return None
        if negated and any(
            getattr(hp.children[1], "nullable", lambda: True)()
            for hp in hoisted
        ):
            # correlated NOT IN with a nullable correlation column: the
            # anti join's null-as-true semantics would apply to the packed
            # (correlation AND operand) key, voiding EVERY outer row when
            # any inner correlation value is NULL — SQL only voids on NULL
            # IN-operands.  Refuse the rewrite.
            return None
        join_preds += hoisted
        mode = JoinMode.ANTI_NULL_AS_TRUE if negated else JoinMode.SEMI
        return L.JoinNode(mode, join_preds, node.left, inner)

    def _rewrite_exists(self, node, pred: ast.Exists):
        sub: ast.Subquery = pred.subquery
        inner, hoisted = self._hoist_correlation(sub)
        if hoisted is None or not hoisted:
            if not sub.is_correlated() and hoisted is not None:
                # uncorrelated EXISTS: leave for direct evaluation
                return None
            return None
        mode = JoinMode.ANTI_NULL_AS_FALSE if pred.negated else JoinMode.SEMI
        return L.JoinNode(mode, hoisted, node.left, inner)

    def _rewrite_correlated_scalar(self, node, pred, outer_operand,
                                   sub: ast.Subquery):
        """x cmp (SELECT agg(...) FROM ... WHERE inner = outer) — group the
        inner aggregate by its correlation columns and join."""
        sub_out = sub.lqp.output_expressions()
        if len(sub_out) != 1:
            return None
        scalar_col = sub_out[0]
        # find the compensated aggregate FIRST: hoisting past it is legal
        # exactly because it re-groups by the correlation keys afterwards
        agg_probe = self._find_sole_aggregate(sub.lqp)
        if agg_probe is None or agg_probe.group_by:
            return None
        from hyrise_tpu.types import AggregateFunction

        if any(
            isinstance(a, ast.AggregateExpression)
            and a.function == AggregateFunction.COUNT
            for a in agg_probe.aggregates
        ) and not _comparison_rejects_zero(pred.condition, outer_operand):
            # COUNT over an empty correlated group is 0, not NULL; the
            # INNER join against the grouped aggregate DROPS outer rows
            # with no matching group, which is only equivalent when the
            # comparison rejects 0 anyway (the Q41 `count > 0` shape)
            return None
        inner, hoisted = self._hoist_correlation(sub, past_agg=agg_probe)
        if hoisted is None or not hoisted:
            return None
        if not all(
            isinstance(jp, ast.Predicate)
            and jp.condition == PredicateCondition.EQUALS
            for jp in hoisted
        ):
            return None  # grouping by the correlation key needs equalities
        agg_node = self._find_sole_aggregate(inner)
        if agg_node is None or agg_node.group_by:
            return None
        corr_cols = []
        for jp in hoisted:
            inner_side = jp.children[1]
            corr_cols.append(inner_side)
        # correlation columns must be plain inner columns below the aggregate
        below_keys = {e.key() for e in agg_node.left.output_expressions()}
        if not all(c.key() in below_keys for c in corr_cols):
            return None
        agg_node.group_by = corr_cols
        self._extend_projections(inner, corr_cols, stop_at=agg_node)
        join = L.JoinNode(JoinMode.INNER, hoisted, node.left, inner)
        return L.PredicateNode(
            ast.Predicate(pred.condition, [outer_operand, scalar_col]), join
        )

    # ------------------------------------------------------------------

    def _hoist_correlation(self, sub: ast.Subquery, past_agg=None):
        """Remove `inner_col = Parameter` predicates from the subquery plan
        and return (inner_root, join_predicates) with the Parameters
        replaced by the outer expressions.  Returns (root, None) when a
        correlated parameter is used in a non-hoistable way.

        Hoisting past an aggregate / set operation / limit / window /
        outer join changes semantics (the filter would no longer restrict
        that operator's input), so correlated predicates below such
        boundaries refuse the rewrite — EXCEPT `past_agg`, the one
        aggregate the correlated-scalar rewrite compensates by grouping
        on the correlation keys."""
        param_map: Dict[int, ast.Expression] = {
            pid: outer for pid, outer in sub.parameters
        }
        hoisted: List[ast.Expression] = []

        # read-only feasibility check first: every parameter use must sit in
        # a hoistable equality predicate (mutation below must not be partial)
        for n in sub.lqp.walk():
            if isinstance(n, L.PredicateNode):
                p = n.predicate
                if self._as_hoistable(p, param_map) is None and _uses_params(
                    p, param_map
                ):
                    return sub.lqp, None
            else:
                if any(_uses_params(e, param_map) for e in n.node_expressions()):
                    return sub.lqp, None
        if _hoist_blocked(sub.lqp, param_map, past_agg):
            return sub.lqp, None

        def visit(node: L.LQPNode) -> Optional[L.LQPNode]:
            if node.left is not None:
                new_left = visit(node.left)
                if new_left is _FAIL:
                    return _FAIL
                node.left = new_left
            if node.right is not None:
                new_right = visit(node.right)
                if new_right is _FAIL:
                    return _FAIL
                node.right = new_right
            if isinstance(node, L.PredicateNode):
                p = node.predicate
                hp = self._as_hoistable(p, param_map)
                if hp is not None:
                    hoisted.append(hp)
                    return node.left
                if _uses_params(p, param_map):
                    return _FAIL
                return node
            if isinstance(node, (L.ProjectionNode, L.AliasNode)):
                # projections must not drop columns the hoisted predicates
                # use; we extend them afterwards
                if any(_uses_params(e, param_map) for e in node.node_expressions()):
                    return _FAIL
                return node
            if any(_uses_params(e, param_map) for e in node.node_expressions()):
                return _FAIL
            return node

        result = visit(sub.lqp)
        if result is _FAIL:
            return sub.lqp, None
        # make sure inner columns used by hoisted predicates survive
        inner_cols = [hp.children[1] for hp in hoisted]
        self._extend_projections(result, inner_cols, stop_at=None)
        return result, hoisted

    def _as_hoistable(self, p: ast.Expression,
                      param_map: Dict[int, ast.Expression]):
        """inner_expr <cmp> f(Parameters) -> Predicate(f(outer) <cmp'>
        inner) with the outer side leftmost; the parameter side may be any
        expression over parameters and literals (e.g. `b.id = a.id + 1`)
        — the Join operator takes non-equi/expression secondaries."""
        from hyrise_tpu.types import FLIPPED_CONDITION

        if not isinstance(p, ast.Predicate) or len(p.children) != 2:
            return None
        if p.condition not in FLIPPED_CONDITION:
            return None
        a, b = p.children
        try:
            if _params_only(a, param_map) and not _uses_params(b, param_map):
                return ast.Predicate(
                    p.condition, [_substitute_params(a, param_map), b]
                )
            if _params_only(b, param_map) and not _uses_params(a, param_map):
                return ast.Predicate(
                    FLIPPED_CONDITION[p.condition],
                    [_substitute_params(b, param_map), a],
                )
        except _CannotSubstitute:
            return None
        return None

    def _find_sole_aggregate(self, root: L.LQPNode) -> Optional[L.AggregateNode]:
        """The TOPMOST aggregate on the left spine (deeper aggregates — a
        CTE's own GROUP BY, TPC-DS Q1-style — are just input and do not
        disqualify the rewrite)."""
        node = root
        while node is not None:
            if isinstance(node, L.AggregateNode):
                return node
            node = node.left
        return None

    def _extend_projections(self, root: L.LQPNode, cols, stop_at) -> None:
        """Append columns to Projection/Alias nodes between root and
        stop_at so hoisted join predicates can reference them."""
        node = root
        while node is not None and node is not stop_at:
            if isinstance(node, L.ProjectionNode):
                for c in cols:
                    if c not in node.expressions:
                        node.expressions.append(c)
            if isinstance(node, L.AliasNode):
                for c in cols:
                    if c not in node.expressions:
                        node.expressions.append(c)
                        node.names.append(c.name())
            node = node.left


def _comparison_rejects_zero(cond, outer_operand) -> bool:
    """True when `outer cmp 0` is False — empty correlated groups (whose
    COUNT is 0) would be filtered by the predicate anyway, so the INNER
    join dropping them is equivalent."""
    if not isinstance(outer_operand, ast.Literal) or not isinstance(
        outer_operand.value, (int, float)
    ):
        return False
    v = outer_operand.value
    truth = {
        PredicateCondition.EQUALS: v == 0,
        PredicateCondition.NOT_EQUALS: v != 0,
        PredicateCondition.LESS_THAN: v < 0,
        PredicateCondition.LESS_THAN_EQUALS: v <= 0,
        PredicateCondition.GREATER_THAN: v > 0,
        PredicateCondition.GREATER_THAN_EQUALS: v >= 0,
    }.get(cond)
    return truth is False


def _hoist_blocked(root: L.LQPNode, param_map, past_agg) -> bool:
    """True when a correlated predicate sits below a hoist boundary:
    aggregates (other than the compensated `past_agg`), set operations,
    limits, windows, or non-inner joins — removing the filter there would
    change that operator's input, not just the row set."""
    from hyrise_tpu.types import JoinMode

    for n in root.walk():
        blocking = (
            isinstance(n, (L.AggregateNode, L.UnionNode, L.IntersectNode,
                           L.ExceptNode, L.LimitNode, L.WindowNode))
            and n is not past_agg
        ) or (
            isinstance(n, L.JoinNode)
            and n.mode not in (JoinMode.INNER, JoinMode.CROSS)
        )
        if not blocking:
            continue
        for d in n.walk():
            if d is n:
                continue
            if any(_uses_params(e, param_map)
                   for e in d.node_expressions()):
                return True
    return False


class _FailSentinel:
    pass


_FAIL = _FailSentinel()


def _uses_params(e: ast.Expression, param_map) -> bool:
    return any(
        isinstance(s, ast.Parameter) and s.parameter_id in param_map
        for s in e.walk()
    )


def _params_only(e: ast.Expression, param_map) -> bool:
    """True when `e` references ONLY correlated parameters and literals
    (no inner columns): it can evaluate entirely on the outer side."""
    if not _uses_params(e, param_map):
        return False
    return all(
        not isinstance(s, (ast.ColumnRef, ast.Subquery, ast.InSubquery,
                           ast.Exists, ast.AggregateExpression))
        for s in e.walk()
    )


def _substitute_params(e: ast.Expression, param_map) -> ast.Expression:
    """Rebuild `e` with correlated Parameters replaced by their outer
    expressions (only for shapes _params_only admits: arithmetic/casts/
    functions over parameters and literals)."""
    if isinstance(e, ast.Parameter) and e.parameter_id in param_map:
        return param_map[e.parameter_id]
    if not e.children:
        return e
    new_children = [_substitute_params(c, param_map) for c in e.children]
    if isinstance(e, ast.Arithmetic):
        return ast.Arithmetic(e.op, new_children[0], new_children[1])
    if isinstance(e, ast.UnaryMinus):
        return ast.UnaryMinus(new_children[0])
    if isinstance(e, ast.Cast):
        return ast.Cast(new_children[0], e.target)
    if isinstance(e, ast.Function):
        return ast.Function(e.fname, new_children)
    if all(nc is oc for nc, oc in zip(new_children, e.children)):
        return e
    raise _CannotSubstitute()


class _CannotSubstitute(Exception):
    pass

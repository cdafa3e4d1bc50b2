"""Constant folding / expression simplification
(ref: optimizer/strategy/expression_reduction_rule.cpp)."""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.kernels.datetime import add_months
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import DataType
from hyrise_tpu.utils.dates import days_to_date_str, single_date_to_days


class ExpressionReductionRule(AbstractRule):
    name = "ExpressionReduction"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        for node in root.walk():
            if isinstance(node, L.PredicateNode):
                node.predicate = reduce_expression(node.predicate)
            elif isinstance(node, (L.ProjectionNode,)):
                node.expressions = [reduce_expression(e) for e in node.expressions]
            elif isinstance(node, L.JoinNode):
                node.predicates = [reduce_expression(p) for p in node.predicates]
            # recurse into subquery plans
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        self.apply(sub.lqp)
        return root


def reduce_expression(e: ast.Expression) -> ast.Expression:
    """Fold literal arithmetic — date +/- interval being the important case
    (TPC-H parameters arrive as date literal +/- interval)."""
    if isinstance(e, ast.Arithmetic):
        left = reduce_expression(e.children[0])
        right = e.children[1]
        if isinstance(right, ast.IntervalLiteral) and isinstance(left, ast.Literal):
            if left.data_type() in (DataType.DATE, DataType.STRING):
                days = single_date_to_days(str(left.value))
                n = right.count if e.op == "+" else -right.count
                if right.unit == "day":
                    out_days = days + n
                else:
                    import jax.numpy as jnp
                    import numpy as np

                    months = n * 12 if right.unit == "year" else n
                    out_days = int(
                        add_months(jnp.asarray(np.array([days], np.int32)), months)[0]
                    )
                return ast.Literal(str(days_to_date_str([out_days])[0]),
                                   DataType.DATE)
        right = reduce_expression(right) if not isinstance(
            right, ast.IntervalLiteral
        ) else right
        if (
            isinstance(left, ast.Literal)
            and isinstance(right, ast.Literal)
            and left.value is not None
            and right.value is not None
            and not isinstance(left.value, str)
            and not isinstance(right.value, str)
        ):
            try:
                val = {
                    "+": lambda a, b: a + b,
                    "-": lambda a, b: a - b,
                    "*": lambda a, b: a * b,
                    "/": lambda a, b: a / b if (isinstance(a, float) or isinstance(b, float)) else _int_div(a, b),
                    "%": lambda a, b: _int_mod(a, b),
                }[e.op](left.value, right.value)
                return ast.Literal(val)
            except ZeroDivisionError:
                return ast.Literal(None)
        if left is not e.children[0] or right is not e.children[1]:
            return ast.Arithmetic(e.op, left, right)
        return e
    if isinstance(e, ast.Predicate):
        children = [reduce_expression(c) for c in e.children]
        if any(a is not b for a, b in zip(children, e.children)):
            return ast.Predicate(e.condition, children)
        return e
    if isinstance(e, ast.Logical):
        l = reduce_expression(e.children[0])
        r = reduce_expression(e.children[1])
        if l is not e.children[0] or r is not e.children[1]:
            return ast.Logical(e.op, l, r)
        return e
    return e


def _int_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _int_mod(a, b):
    return a - _int_div(a, b) * b

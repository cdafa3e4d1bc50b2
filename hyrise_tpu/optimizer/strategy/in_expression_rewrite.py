"""IN-list rewrite (ref: optimizer/strategy/in_expression_rewrite_rule.cpp):
the reference expands small IN lists to OR chains or a join against a
temporary table.  Our evaluator already vectorizes IN lists as fused
equality ORs on device, so this rule currently normalizes only trivial
cases (single-element lists -> plain equality)."""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L


class InExpressionRewriteRule(AbstractRule):
    name = "InExpressionRewrite"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        for node in root.walk():
            if isinstance(node, L.PredicateNode):
                node.predicate = self._rewrite(node.predicate)
        return root

    def _rewrite(self, e: ast.Expression) -> ast.Expression:
        if isinstance(e, ast.InList) and len(e.values) == 1:
            p = ast.eq(e.operand, e.values[0])
            return ast.Not(p) if e.negated else p
        return e

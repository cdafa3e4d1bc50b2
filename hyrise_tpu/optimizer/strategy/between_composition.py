"""Between composition (ref: optimizer/strategy/
between_composition_rule.cpp): adjacent PredicateNodes carrying a lower
bound (>/>=) and an upper bound (</<=) on the SAME column expression are
fused into a single BETWEEN_* predicate.

On the TPU path this halves the comparison+AND work inside the fused scan
stage and — more importantly — presents the range as one predicate to the
cardinality estimator, whose histogram slicing estimates a closed range
far better than two independently-damped half-open scans."""

from __future__ import annotations

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import PredicateCondition as PC

_LOWER = {PC.GREATER_THAN_EQUALS: False, PC.GREATER_THAN: True}
_UPPER = {PC.LESS_THAN_EQUALS: False, PC.LESS_THAN: True}

_BETWEEN = {
    # (lower_exclusive, upper_exclusive) -> condition
    (False, False): PC.BETWEEN_INCLUSIVE,
    (True, False): PC.BETWEEN_LOWER_EXCLUSIVE,
    (False, True): PC.BETWEEN_UPPER_EXCLUSIVE,
    (True, True): PC.BETWEEN_EXCLUSIVE,
}


def _bound(pred: ast.Expression):
    """-> (col_key, col_expr, 'lo'|'hi', exclusive, literal) or None."""
    if not isinstance(pred, ast.Predicate) or len(pred.children) != 2:
        return None
    lhs, rhs = pred.children
    if not isinstance(rhs, ast.Literal):
        return None
    if pred.condition in _LOWER:
        return (lhs.key(), lhs, "lo", _LOWER[pred.condition], rhs)
    if pred.condition in _UPPER:
        return (lhs.key(), lhs, "hi", _UPPER[pred.condition], rhs)
    return None


class BetweenCompositionRule(AbstractRule):
    name = "BetweenComposition"

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
            if isinstance(node, L.PredicateNode) and isinstance(
                node.left, L.PredicateNode
            ):
                return self._compose(node)
            return node

        return visit(root)

    def _compose(self, top: L.PredicateNode) -> L.LQPNode:
        # collect the maximal chain of PredicateNodes below `top`
        chain = [top]
        while isinstance(chain[-1].left, L.PredicateNode):
            chain.append(chain[-1].left)
        below = chain[-1].left

        bounds = {}  # col_key -> {"lo": (excl, lit), "hi": ..., "expr": col}
        passthrough = []
        for pn in chain:
            b = _bound(pn.predicate)
            if b is None:
                passthrough.append(pn.predicate)
                continue
            ck, expr, side, excl, lit = b
            slot = bounds.setdefault(ck, {"expr": expr})
            if side in slot:  # duplicate bound on the same side: keep both
                passthrough.append(pn.predicate)
            else:
                slot[side] = (excl, lit)

        composed = []
        for slot in bounds.values():
            if "lo" in slot and "hi" in slot:
                (lo_x, lo), (hi_x, hi) = slot["lo"], slot["hi"]
                composed.append(
                    ast.Predicate(_BETWEEN[(lo_x, hi_x)], [slot["expr"], lo, hi])
                )
            else:
                for side in ("lo", "hi"):
                    if side in slot:
                        excl, lit = slot[side]
                        if side == "lo":
                            cond = PC.GREATER_THAN if excl else PC.GREATER_THAN_EQUALS
                        else:
                            cond = PC.LESS_THAN if excl else PC.LESS_THAN_EQUALS
                        composed.append(
                            ast.Predicate(cond, [slot["expr"], lit])
                        )
        if len(composed) + len(passthrough) == len(chain):
            return top  # nothing fused; keep the original chain
        out = below
        for pred in reversed(passthrough + composed):
            out = L.PredicateNode(pred, out)
        return out

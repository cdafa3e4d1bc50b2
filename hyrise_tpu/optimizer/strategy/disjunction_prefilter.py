"""Derive implied per-column prefilters from disjunctions of
conjunctions (classic OR-decomposition; the reference has no analogue —
its plans evaluate such ORs post-join, ref: expression_evaluator.cpp
disjunction handling).

TPC-H Q7's shape:

    (n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
    OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE')

implies  n1.n_name IN ('FRANCE','GERMANY')  AND  n2.n_name IN (...).
The derived IN-filters are strictly weaker than the OR (which stays in
place), but they are SINGLE-COLUMN, so PredicatePlacement — which runs
after this rule — pushes them below the join chain onto the 25-row
nation scans.  On TPU that converts a filter evaluated after a 6M-row
4-way join into dim prefilters whose selectivity the cost model sees,
letting the join chain compact early (the difference between Q7 running
at 8M padded capacity versus ~512k)."""

from __future__ import annotations

from typing import Dict, List, Tuple

from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import PredicateCondition

_MAX_DISJUNCTS = 8
_MAX_VALUES = 24


def _flatten(e: ast.Expression, op: str) -> List[ast.Expression]:
    if isinstance(e, ast.Logical) and e.op == op:
        return _flatten(e.children[0], op) + _flatten(e.children[1], op)
    return [e]


def _equalities(conjunct: ast.Expression) -> List[Tuple[ast.Expression,
                                                        ast.Expression]]:
    """(column-expression, literal) pairs this conjunct pins."""
    out = []
    if isinstance(conjunct, ast.Predicate) and \
            conjunct.condition == PredicateCondition.EQUALS:
        a, b = conjunct.children
        if isinstance(b, ast.Literal) and not isinstance(a, ast.Literal):
            out.append((a, b))
        elif isinstance(a, ast.Literal) and not isinstance(b, ast.Literal):
            out.append((b, a))
    elif isinstance(conjunct, ast.InList) and not conjunct.negated and \
            all(isinstance(v, ast.Literal) for v in conjunct.values):
        for v in conjunct.values:
            out.append((conjunct.operand, v))
    return out


def derive_prefilters(expr: ast.Expression) -> List[ast.Expression]:
    disjuncts = _flatten(expr, "or")
    if not 2 <= len(disjuncts) <= _MAX_DISJUNCTS:
        return []
    maps: List[Dict[tuple, Tuple[ast.Expression, List[ast.Expression]]]] = []
    for d in disjuncts:
        m: Dict[tuple, Tuple[ast.Expression, List[ast.Expression]]] = {}
        for c in _flatten(d, "and"):
            for col, litv in _equalities(c):
                m.setdefault(col.key(), (col, []))[1].append(litv)
        if not m:
            return []  # one disjunct pins nothing -> nothing is implied
        maps.append(m)
    common = set(maps[0])
    for m in maps[1:]:
        common &= set(m)
    out = []
    for k in sorted(common, key=repr):
        col = maps[0][k][0]  # REUSE the original expression object (cid
        #                      identity is cache-key material)
        vals: List[ast.Expression] = []
        seen = set()
        for m in maps:
            for v in m[k][1]:
                if v.key() not in seen:
                    seen.add(v.key())
                    vals.append(v)
        if len(vals) > _MAX_VALUES:
            continue
        out.append(ast.InList(col, vals, False))
    return out


class DisjunctionPrefilterRule(AbstractRule):
    name = "DisjunctionPrefilter"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        def visit(node: L.LQPNode) -> L.LQPNode:
            if node.left is not None:
                node.left = visit(node.left)
            if node.right is not None:
                node.right = visit(node.right)
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        sub.lqp = self.apply(sub.lqp)
            if isinstance(node, L.PredicateNode):
                existing = {
                    c.key() for c in _flatten(node.predicate, "and")
                }
                derived = [
                    d for d in derive_prefilters(node.predicate)
                    if d.key() not in existing
                ]
                # insert BELOW the OR so placement can keep pushing them
                # toward the scans
                for d in derived:
                    node.left = L.PredicateNode(d, node.left)
            return node

        return visit(root)

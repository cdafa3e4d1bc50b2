"""Join-to-semi-join rewrite (ref: optimizer/strategy/
join_to_semi_join_rule.cpp): an inner equi-join whose right side's columns
are never used above it and whose join key is unique on the right acts as
a pure filter — it becomes a SEMI join.

On the TPU execution path a semi join skips the whole match-expansion
stage (count -> bucket -> host sync -> gather): its output is just a
selection mask over the probe side, produced in the same fused stage as
the key probe.  That removes a host round-trip per rewritten join, which
through a remote TPU tunnel is the dominant per-operator cost."""

from __future__ import annotations

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.types import JoinMode, PredicateCondition


def _key_unique_below(node: L.LQPNode, col: ast.ColumnRef) -> bool:
    """True when `col` is guaranteed distinct in `node`'s output: it is a
    declared single-column soft key of its origin table and no node under
    `node` can duplicate rows of that table (expanding joins, unions), or
    `node` groups by exactly that column."""
    if isinstance(node, L.AggregateNode):
        # uniqueness holds only when the aggregate groups by EXACTLY this
        # column: with multiple keys the output has one row per key TUPLE,
        # so a single key column repeats across tuples
        return (
            len(node.group_by) == 1
            and isinstance(node.group_by[0], ast.ColumnRef)
            and node.group_by[0].key() == col.key()
        )
    if getattr(col, "origin", None) is None:
        return False
    for n in node.walk():
        if isinstance(n, L.JoinNode) and n.mode not in (
            JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
            JoinMode.ANTI_NULL_AS_FALSE,
        ):
            return False  # expanding join below may duplicate key rows
        if isinstance(n, L.UnionNode):
            return False
    try:
        table = Database.get().storage_manager.get_table(col.origin)
    except KeyError:
        return False
    return any(set(kc.columns) == {col.display_name}
               for kc in table.key_constraints)


class JoinToSemiJoinRule(AbstractRule):
    name = "JoinToSemiJoin"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        used_above: dict = {}

        def visit(node: L.LQPNode, inherited: frozenset) -> None:
            used_above[id(node)] = inherited
            here = set(inherited)
            for e in node.node_expressions():
                for sub in e.walk():
                    if isinstance(sub, ast.Subquery):
                        sub.lqp = self.apply(sub.lqp)
                for c in e.referenced_columns():
                    here.add(c.key())
            child_set = frozenset(here)
            if node.left is not None:
                visit(node.left, child_set)
            if node.right is not None:
                visit(node.right, child_set)

        # root outputs everything it produces
        root_out = frozenset(e.key() for e in root.output_expressions())
        visit(root, root_out)

        for node in root.walk():
            if not (isinstance(node, L.JoinNode)
                    and node.mode == JoinMode.INNER
                    and len(node.predicates) == 1):
                continue
            pred = node.predicates[0]
            if pred.condition != PredicateCondition.EQUALS:
                continue
            lhs, rhs = pred.children
            if not (isinstance(lhs, ast.ColumnRef)
                    and isinstance(rhs, ast.ColumnRef)):
                continue
            right_cols = {e.key() for e in node.right.output_expressions()}
            left_cols = {e.key() for e in node.left.output_expressions()}
            # orient: which side does each predicate column come from
            if lhs.key() in right_cols and rhs.key() in left_cols:
                lhs, rhs = rhs, lhs
            if not (lhs.key() in left_cols and rhs.key() in right_cols):
                continue
            needed = used_above.get(id(node), frozenset())
            if right_cols & needed:
                continue  # right columns are consumed above the join
            if _key_unique_below(node.right, rhs):
                node.mode = JoinMode.SEMI
        return root

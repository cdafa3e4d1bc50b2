"""Block pruning (ref: optimizer/strategy/chunk_pruning_rule.cpp):
attach the simple column-vs-literal comparisons sitting above each stored
table to its StoredTableNode; GetTable skips blocks whose host-side
min/max statistics prove no row can match (statistics/pruning.py)."""

from __future__ import annotations

from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.statistics.pruning import collect_pruning_predicates


class BlockPruningRule(AbstractRule):
    name = "BlockPruning"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        for node in root.walk():
            if not isinstance(node, L.PredicateNode):
                continue
            preds = collect_pruning_predicates(node.predicate)
            if not preds:
                continue
            # the chain below must preserve the base layout
            below = node.left
            while isinstance(below, (L.PredicateNode, L.ValidateNode)):
                below = below.left
            if not isinstance(below, L.StoredTableNode):
                continue
            table_cols = {e.key() for e in below.all_columns()}
            for p in preds:
                if (p.children[0].key() in table_cols
                        and p not in below.pruning_predicates):
                    below.pruning_predicates.append(p)
        return root

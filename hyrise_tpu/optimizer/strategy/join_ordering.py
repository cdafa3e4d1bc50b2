"""Join ordering (ref: optimizer/join_ordering/ — DpCcp below a size
threshold, GreedyOperatorOrdering above; join_ordering_rule.hpp:20-24).

The full cardinality-driven DpCcp runs once statistics land
(statistics/cardinality.py); until then this rule is greedy: for chains of
inner joins it keeps the parsed order but builds left-deep trees preferring
smaller base tables first (row counts from the storage manager).
"""

from __future__ import annotations

from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L


class JoinOrderingRule(AbstractRule):
    name = "JoinOrdering"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        # Placeholder for the DpCcp/GOO implementation (tracked in
        # optimizer/join_ordering once the cardinality estimator exists);
        # the parsed join order is preserved.
        return root

"""Rule-based optimizer (ref: optimizer/optimizer.cpp:198-272 —
create_default_optimizer fixes the rule order; one file per rule under
optimizer/strategy/).

Rules run in sequence over the LQP; each rule rewrites destructively and
returns the (possibly new) root.
"""

from __future__ import annotations

from typing import List

from hyrise_tpu.plan import lqp as L


class AbstractRule:
    name = "AbstractRule"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        raise NotImplementedError


class Optimizer:
    def __init__(self, rules: List[AbstractRule]):
        self.rules = rules

    @staticmethod
    def create_default_optimizer() -> "Optimizer":
        from hyrise_tpu.optimizer.strategy.expression_reduction import (
            ExpressionReductionRule,
        )
        from hyrise_tpu.optimizer.strategy.subquery_to_join import SubqueryToJoinRule
        from hyrise_tpu.optimizer.strategy.predicate_placement import (
            PredicatePlacementRule,
        )
        from hyrise_tpu.optimizer.strategy.column_pruning import ColumnPruningRule
        from hyrise_tpu.optimizer.strategy.join_ordering import JoinOrderingRule
        from hyrise_tpu.optimizer.strategy.predicate_reordering import (
            PredicateReorderingRule,
        )
        from hyrise_tpu.optimizer.strategy.join_to_semi_join import (
            JoinToSemiJoinRule,
        )
        from hyrise_tpu.optimizer.strategy.in_expression_rewrite import (
            InExpressionRewriteRule,
        )
        from hyrise_tpu.optimizer.strategy.join_predicate_ordering import (
            JoinPredicateOrderingRule,
        )
        from hyrise_tpu.optimizer.strategy.semi_join_reduction import (
            SemiJoinReductionRule,
        )
        from hyrise_tpu.optimizer.strategy.predicate_merge import (
            PredicateMergeRule,
        )
        from hyrise_tpu.optimizer.strategy.null_scan_removal import (
            NullScanRemovalRule,
        )
        from hyrise_tpu.optimizer.strategy.dependent_group_by import (
            DependentGroupByReductionRule,
        )
        from hyrise_tpu.optimizer.strategy.between_composition import (
            BetweenCompositionRule,
        )
        from hyrise_tpu.optimizer.strategy.join_to_predicate import (
            JoinToPredicateRewriteRule,
        )
        from hyrise_tpu.optimizer.strategy.disjunction_prefilter import (
            DisjunctionPrefilterRule,
        )
        from hyrise_tpu.optimizer.strategy.block_pruning import (
            BlockPruningRule,
        )
        from hyrise_tpu.optimizer.strategy.aggregate_reduction import (
            AggregateReductionRule,
        )

        # Rule order mirrors the reference (optimizer.cpp:198-272):
        # reductions first, then subquery unnesting, join ordering,
        # predicate placement/reordering, pruning last.
        return Optimizer([
            ExpressionReductionRule(),
            InExpressionRewriteRule(),
            DisjunctionPrefilterRule(),
            SubqueryToJoinRule(),
            DependentGroupByReductionRule(),
            SemiJoinReductionRule(),
            PredicatePlacementRule(),
            JoinOrderingRule(),
            PredicatePlacementRule(),
            JoinToSemiJoinRule(),
            JoinToPredicateRewriteRule(),
            JoinPredicateOrderingRule(),
            NullScanRemovalRule(),
            BetweenCompositionRule(),
            PredicateReorderingRule(),
            PredicateMergeRule(),
            # AggregateReduction introduces a DAG (the join partner is
            # shared with the reducer's build side) — it must run after
            # every chain-splicing rule; BlockPruning/ColumnPruning below
            # are DAG-safe.  The SemiJoinReduction re-run pushes the new
            # reducer down through joins inside the aggregate's input.
            AggregateReductionRule(),
            SemiJoinReductionRule(),
            BlockPruningRule(),
            ColumnPruningRule(),
        ])

    def optimize(self, root: L.LQPNode) -> L.LQPNode:
        for rule in self.rules:
            root = rule.apply(root)
        return root

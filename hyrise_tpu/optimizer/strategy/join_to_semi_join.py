"""Join-to-semi-join rewrite (ref: optimizer/strategy/
join_to_semi_join_rule.cpp): an inner join whose right side's columns are
never used above and whose join keys are unique on the right can become a
semi join (skipping output expansion).  Requires unique-column knowledge
from soft key constraints; enabled once constraints flow through plans."""

from __future__ import annotations

from hyrise_tpu.optimizer.optimizer import AbstractRule
from hyrise_tpu.plan import lqp as L


class JoinToSemiJoinRule(AbstractRule):
    name = "JoinToSemiJoin"

    def apply(self, root: L.LQPNode) -> L.LQPNode:
        return root

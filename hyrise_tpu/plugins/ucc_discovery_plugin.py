"""Unique-column-combination discovery plugin (ref:
plugins/ucc_discovery_plugin.hpp:44-111 — mines the LQP cache for join and
group-by columns, validates uniqueness against the data, installs soft key
constraints so optimizer rewrites (JoinToSemiJoin, DependentGroupByReduction)
unlock)."""

from __future__ import annotations

from typing import List, Set, Tuple

import numpy as np

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.plugins.plugin_manager import AbstractPlugin
from hyrise_tpu.storage.table import TableKeyConstraint
from hyrise_tpu.types import PredicateCondition


class UccDiscoveryPlugin(AbstractPlugin):
    def description(self) -> str:
        return "Unique column combination discovery"

    def start(self) -> None:
        pass

    def stop(self) -> None:
        pass

    def executable_functions(self):
        return {"DiscoverUCCs": self.discover_uccs}

    # ------------------------------------------------------------------

    def discover_uccs(self) -> None:
        """Ref flow (ucc_discovery_plugin.hpp): candidate columns from
        cached plans' join/group-by expressions -> validate -> install."""
        db = Database.get()
        candidates: Set[Tuple[str, str]] = set()
        for plan in db.default_lqp_cache.values():
            if not isinstance(plan, L.LQPNode):
                continue
            for node in plan.walk():
                if isinstance(node, L.JoinNode):
                    for p in node.predicates:
                        if (
                            isinstance(p, ast.Predicate)
                            and p.condition == PredicateCondition.EQUALS
                        ):
                            for side in p.children:
                                self._add_candidate(side, candidates)
                elif isinstance(node, L.AggregateNode):
                    for g in node.group_by:
                        self._add_candidate(g, candidates)
        installed = 0
        for table_name, column in sorted(candidates):
            if self._validate_and_install(table_name, column):
                installed += 1
        db.log_manager.add_message(
            "UccDiscoveryPlugin",
            f"validated {len(candidates)} candidates, installed {installed} UCCs",
        )

    def _add_candidate(self, expr: ast.Expression, out: Set[Tuple[str, str]]):
        if isinstance(expr, ast.ColumnRef) and expr.origin:
            out.add((expr.origin, expr.display_name))

    def _validate_and_install(self, table_name: str, column: str) -> bool:
        db = Database.get()
        try:
            table = db.storage_manager.get_table(table_name)
            col = table.column(column)
        except KeyError:
            return False
        for kc in table.key_constraints:
            if kc.columns == (column,):
                return False  # already known
        n = table.num_rows
        if n == 0 or col.validity is not None:
            return False  # nullable columns cannot be keys
        data = col.host_raw(n)
        if len(np.unique(data)) != n:
            return False
        table.key_constraints.append(TableKeyConstraint((column,), False))
        return True


def factory() -> AbstractPlugin:
    return UccDiscoveryPlugin()

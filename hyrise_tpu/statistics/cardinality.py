"""Cardinality estimation over LQPs (ref: statistics/cardinality_estimator.cpp
— walks the plan, slicing/scaling histograms per predicate/join/aggregate;
ours keeps per-(plan-node) caches and per-column (ndv, min, max) summaries
propagated through the operators).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import numpy as np

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.statistics.table_statistics import (
    ColumnStatistics,
    get_table_statistics,
)
from hyrise_tpu.types import DataType, JoinMode, PredicateCondition
from hyrise_tpu.utils.dates import single_date_to_days

DEFAULT_SELECTIVITY = 0.3
LIKE_SELECTIVITY = 0.1


class CardinalityEstimator:
    def __init__(self):
        self._node_cache: Dict[int, float] = {}
        self._base_col_stats: Dict[tuple, Tuple[ColumnStatistics, object]] = {}
        self._collected = False

    # ------------------------------------------------------------------ API

    def estimate(self, node: L.LQPNode) -> float:
        key = id(node)
        if key in self._node_cache:
            return self._node_cache[key]
        out = max(self._estimate(node), 0.0)
        self._node_cache[key] = out
        return out

    def column_stats(self, expr: ast.Expression) -> Optional[ColumnStatistics]:
        """Base-table statistics for a plain column reference."""
        if not isinstance(expr, ast.ColumnRef):
            return None
        hit = self._base_col_stats.get(expr.key())
        if hit is not None:
            return hit[0]
        if not expr.origin:
            return None
        db = Database.get()
        try:
            table = db.storage_manager.get_table(expr.origin)
        except KeyError:
            return None
        stats = get_table_statistics(table)
        cs = stats.columns.get(expr.display_name)
        if cs is None:
            return None
        dictionary = None
        try:
            col = table.column(expr.display_name)
            dictionary = col.dictionary
        except KeyError:
            pass
        self._base_col_stats[expr.key()] = (cs, dictionary)
        return cs

    def column_stats_fresh(self, expr: ast.Expression) -> Optional[ColumnStatistics]:
        """Like column_stats, but only when the base table's statistics were
        built at the CURRENT row count — required by fast paths that treat
        min/max as hard bounds (soft invalidation keeps stale histograms
        around; rows appended after the build could exceed the recorded max
        and be silently clipped/merged)."""
        cs = self.column_stats(expr)
        if cs is None or not isinstance(expr, ast.ColumnRef) or not expr.origin:
            return None
        try:
            table = Database.get().storage_manager.get_table(expr.origin)
        except KeyError:
            return None
        if cs.row_count != table.num_rows:
            return None
        return cs

    def column_dictionary(self, expr: ast.Expression):
        self.column_stats(expr)
        hit = self._base_col_stats.get(expr.key())
        return hit[1] if hit else None

    def distinct_count(self, expr: ast.Expression, upper: float) -> float:
        cs = self.column_stats(expr)
        if cs is not None:
            return min(cs.distinct_count, upper)
        return max(upper * 0.5, 1.0)

    # ------------------------------------------------------------ internals

    def _estimate(self, node: L.LQPNode) -> float:
        t = type(node)
        if t is L.StoredTableNode:
            try:
                return float(
                    Database.get().storage_manager.get_table(node.table_name).num_rows
                )
            except KeyError:
                return 1000.0
        if t is L.StaticTableNode:
            return float(node.table.num_rows)
        if t is L.DummyTableNode:
            return 1.0
        if t is L.PredicateNode:
            base = self.estimate(node.left)
            return base * self.predicate_selectivity(node.predicate, base)
        if t is L.JoinNode:
            return self._estimate_join(node)
        if t is L.AggregateNode:
            base = self.estimate(node.left)
            if not node.group_by:
                return 1.0
            groups = 1.0
            for g in node.group_by:
                groups *= self.distinct_count(g, base)
            return min(groups, base)
        if t is L.DistinctNode:
            return max(self.estimate(node.left) * 0.5, 1.0)
        if t is L.LimitNode:
            base = self.estimate(node.left)
            if isinstance(node.row_count, ast.Literal):
                return min(base, float(node.row_count.value))
            return base
        if t is L.UnionNode:
            return self.estimate(node.left) + self.estimate(node.right)
        if t in (L.IntersectNode, L.ExceptNode):
            return max(self.estimate(node.left) * 0.5, 1.0)
        if node.left is not None:
            return self.estimate(node.left)
        return 1.0

    def _estimate_join(self, node: L.JoinNode) -> float:
        l = self.estimate(node.left)
        r = self.estimate(node.right) if node.right is not None else 1.0
        if node.mode == JoinMode.CROSS or not node.predicates:
            return l * r
        if node.mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
                         JoinMode.ANTI_NULL_AS_FALSE):
            # semi selectivity ~ fraction of left key values present on the
            # right: min(1, ndv_r / ndv_l) per equi predicate (take the most
            # selective).  The old flat 0.5 hid 1000x reductions (a semi
            # reducer of 6M lineitem rows by 200 filtered parts estimated
            # 3M, so downstream compaction never fired).
            sels = []
            for p in node.predicates:
                if not (isinstance(p, ast.Predicate) and len(p.children) == 2
                        and p.condition == PredicateCondition.EQUALS):
                    continue
                ndv_l = self.distinct_count(p.children[0], l)
                ndv_r = self.distinct_count(p.children[1], r)
                if ndv_l > 0:
                    sels.append(min(1.0, ndv_r / ndv_l))
            sel = min(sels) if sels else 0.5
            if node.mode == JoinMode.SEMI:
                return max(l * sel, 1.0)
            return max(l * (1.0 - sel), 1.0)
        out = self.join_output_rows(l, r, node.predicates)
        if node.mode in (JoinMode.LEFT, JoinMode.FULL):
            out = max(out, l)
        if node.mode in (JoinMode.RIGHT, JoinMode.FULL):
            out = max(out, r)
        return out

    def join_output_rows(self, l_rows: float, r_rows: float, predicates) -> float:
        """|L|x|R| / max(ndv) per equi predicate (classic System-R),
        DEFAULT_SELECTIVITY for non-equi extras.  The combined equi divisor
        is capped at max(|L|,|R|): a composite key's distinct count cannot
        exceed either side's row count (the independence assumption would
        otherwise make multi-key joins look absurdly selective and invert
        join orders — TPC-H Q9's lineitem x partsupp)."""
        out = l_rows * r_rows
        divisor = 1.0
        for p in predicates:
            if (
                isinstance(p, ast.Predicate)
                and p.condition == PredicateCondition.EQUALS
                and len(p.children) == 2
            ):
                a, b = p.children
                # which side each expression belongs to is not tracked
                # here, so cap both NDVs by max(|L|,|R|) — capping by the
                # wrong (smaller) side undercounted a big side's NDV and
                # overestimated join output by orders of magnitude
                cap = max(l_rows, r_rows)
                nda = self.distinct_count(a, cap)
                ndb = self.distinct_count(b, cap)
                divisor *= max(nda, ndb, 1.0)
            else:
                out *= DEFAULT_SELECTIVITY
        divisor = min(divisor, max(l_rows, r_rows, 1.0))
        return max(out / divisor, 1.0)

    # ------------------------------------------------------- selectivities

    def predicate_selectivity(self, pred: ast.Expression, base_rows: float) -> float:
        if isinstance(pred, ast.Logical):
            s1 = self.predicate_selectivity(pred.children[0], base_rows)
            s2 = self.predicate_selectivity(pred.children[1], base_rows)
            if pred.op == "and":
                return s1 * s2
            return min(1.0, s1 + s2 - s1 * s2)
        if isinstance(pred, ast.Not):
            return 1.0 - self.predicate_selectivity(pred.children[0], base_rows)
        if isinstance(pred, ast.InList):
            col = pred.operand
            ndv = self.distinct_count(col, base_rows)
            sel = min(1.0, len(pred.values) / max(ndv, 1.0))
            return 1.0 - sel if pred.negated else sel
        if isinstance(pred, (ast.InSubquery, ast.Exists)):
            return 0.5
        if not isinstance(pred, ast.Predicate):
            return DEFAULT_SELECTIVITY
        cond = pred.condition
        if cond in (PredicateCondition.LIKE,):
            return LIKE_SELECTIVITY
        if cond in (PredicateCondition.NOT_LIKE,):
            return 1.0 - LIKE_SELECTIVITY
        if cond == PredicateCondition.IS_NULL:
            cs = self.column_stats(pred.children[0])
            return cs.null_fraction if cs else 0.1
        if cond == PredicateCondition.IS_NOT_NULL:
            cs = self.column_stats(pred.children[0])
            return 1.0 - (cs.null_fraction if cs else 0.1)
        if len(pred.children) < 2:
            return DEFAULT_SELECTIVITY
        col, lit = pred.children[0], pred.children[1]
        if isinstance(col, ast.Literal) and not isinstance(lit, ast.Literal):
            from hyrise_tpu.types import FLIPPED_CONDITION

            flipped = FLIPPED_CONDITION.get(cond)
            if flipped is None:
                return DEFAULT_SELECTIVITY
            col, lit = lit, col
            cond = flipped
        cs = self.column_stats(col)
        if cs is None or cs.row_count == 0:
            return DEFAULT_SELECTIVITY
        value = self._literal_value(lit, col)
        if cond == PredicateCondition.EQUALS:
            return min(1.0, 1.0 / max(cs.distinct_count, 1.0))
        if cond == PredicateCondition.NOT_EQUALS:
            return 1.0 - min(1.0, 1.0 / max(cs.distinct_count, 1.0))
        if value is None or cs.min_value is None:
            return DEFAULT_SELECTIVITY
        lo, hi = cs.min_value, cs.max_value
        if cond in (
            PredicateCondition.BETWEEN_INCLUSIVE,
            PredicateCondition.BETWEEN_LOWER_EXCLUSIVE,
            PredicateCondition.BETWEEN_UPPER_EXCLUSIVE,
            PredicateCondition.BETWEEN_EXCLUSIVE,
        ):
            v2 = self._literal_value(
                pred.children[2] if len(pred.children) > 2 else None, col
            )
            if v2 is None:
                return DEFAULT_SELECTIVITY
            return self._range_fraction(cs, value, v2)
        if cond in (PredicateCondition.LESS_THAN,
                    PredicateCondition.LESS_THAN_EQUALS):
            return self._range_fraction(cs, lo, value)
        if cond in (PredicateCondition.GREATER_THAN,
                    PredicateCondition.GREATER_THAN_EQUALS):
            return self._range_fraction(cs, value, hi)
        return DEFAULT_SELECTIVITY

    def _range_fraction(self, cs: ColumnStatistics, lo: float, hi: float) -> float:
        if hi < lo:
            return 0.0
        if cs.histogram is not None and cs.row_count > 0:
            return min(1.0, cs.histogram.estimate_range(lo, hi) / cs.row_count)
        span = max(cs.max_value - cs.min_value, 1e-12)
        return min(1.0, max(0.0, (hi - lo) / span))

    def _literal_value(self, lit, col_expr) -> Optional[float]:
        if not isinstance(lit, ast.Literal) or lit.value is None:
            return None
        v = lit.value
        if lit.data_type() == DataType.DATE or (
            isinstance(v, str) and _looks_like_date(v)
            and col_expr.data_type() == DataType.DATE
        ):
            try:
                return float(single_date_to_days(str(v)))
            except Exception:
                return None
        if isinstance(v, str):
            dictionary = self.column_dictionary(col_expr)
            if dictionary is not None and len(dictionary):
                return float(np.searchsorted(dictionary, v))
            return None
        return float(v)


def _looks_like_date(s: str) -> bool:
    return len(s) == 10 and s[4] == "-" and s[7] == "-"


def _first_col_side(e: ast.Expression) -> bool:
    return True

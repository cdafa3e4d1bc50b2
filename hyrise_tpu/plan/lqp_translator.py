"""LQP -> physical operator (PQP) translation
(ref: logical_query_plan/lqp_translator.cpp:138-175 — 1:1 node mapping,
uncorrelated-subquery wiring, predicate -> scan dispatch).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from hyrise_tpu.expression import ast
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.operators.base import AbstractOperator
from hyrise_tpu.operators import (
    Aggregate,
    AliasOperator,
    Difference,
    GetTable,
    Intersect,
    Join,
    Limit,
    Product,
    Projection,
    Sort,
    TableScan,
    TableWrapper,
    UnionAll,
    UnionUnique,
)
from hyrise_tpu.operators.joins import JoinPredicate
from hyrise_tpu.operators.set_ops import Distinct
from hyrise_tpu.types import (
    FLIPPED_CONDITION,
    JoinMode,
    PredicateCondition,
    SetOperationMode,
)


class LQPTranslationError(ValueError):
    pass


def _compute_demands(root: L.LQPNode) -> Dict[int, set]:
    """Per-node demand: the expression keys a node's ANCESTORS reference
    (its own expressions excluded).  Joins use this to assemble only the
    output columns someone above actually consumes — spent join keys
    otherwise ride through every later join as 6M-row gathers (the
    reference reaches the same effect via ColumnPruningRule's inserted
    pruning projections, column_pruning_rule.cpp).

    Conservative: every subexpression key in an ancestor counts, and
    subquery plans contribute their whole expression surface (correlated
    references into the outer plan stay live)."""
    demands: Dict[int, set] = {}

    def expr_keys(node: L.LQPNode) -> set:
        ks: set = set()
        stack = list(node.node_expressions())
        seen_plans: set = set()
        while stack:
            e = stack.pop()
            for sub in e.walk():
                try:
                    ks.add(sub.key())
                except Exception:
                    pass
                if isinstance(sub, ast.Subquery) and sub.lqp is not None \
                        and id(sub.lqp) not in seen_plans:
                    seen_plans.add(id(sub.lqp))
                    inner = [sub.lqp]
                    iseen: set = set()
                    while inner:
                        n = inner.pop()
                        if id(n) in iseen:
                            continue
                        iseen.add(id(n))
                        stack.extend(n.node_expressions())
                        inner.extend(n.inputs())
        return ks

    local_cache: Dict[int, set] = {}

    def visit(node: L.LQPNode, above: set) -> None:
        prev = demands.get(id(node))
        if prev is not None:
            if above <= prev:
                return
            prev |= above
        else:
            demands[id(node)] = set(above)
        lk = local_cache.get(id(node))
        if lk is None:
            lk = expr_keys(node)
            local_cache[id(node)] = lk
        child_above = demands[id(node)] | lk
        for ch in node.inputs():
            visit(ch, child_above)

    visit(root, {e.key() for e in root.output_expressions()})
    return demands


class LQPTranslator:
    def __init__(self):
        from hyrise_tpu.statistics.cardinality import CardinalityEstimator

        self._estimator = CardinalityEstimator()

    def translate(self, node: L.LQPNode) -> AbstractOperator:
        cache: Dict[int, AbstractOperator] = {}
        self._demands = _compute_demands(node)
        return self._translate(node, cache)

    def _translate(self, node: L.LQPNode, cache) -> AbstractOperator:
        if id(node) in cache:
            return cache[id(node)]
        op = self._translate_node(node, cache)
        # annotate the optimizer's row estimate: operators use it to decide
        # whether a deferred selection is worth a count sync + compaction
        try:
            op.estimated_rows = self._estimator.estimate(node)
        except Exception:
            op.estimated_rows = None
        cache[id(node)] = op
        return op

    def _translate_node(self, node: L.LQPNode, cache) -> AbstractOperator:
        t = type(node)
        if t is L.StoredTableNode:
            op = GetTable(
                node.table_name,
                pruned_column_names=node.pruned_column_names,
                output_expressions=node.output_expressions(),
                include_row_ids=node.include_row_ids,
                pruning_predicates=node.pruning_predicates,
            )
            # dynamic pruning: subquery-valued pruning predicates need
            # their subplans executed before the leaf reads blocks (ref:
            # get_table.hpp:57-58 + operator_task.cpp:63-99 pruning edges)
            self._wire_subqueries(op, node.pruning_predicates, cache)
            return op
        if t is L.StaticTableNode:
            op = TableWrapper(node.table)
            op.output_expressions = node.output_expressions()
            return op
        if t is L.DummyTableNode:
            from hyrise_tpu.storage.table import Table

            op = TableWrapper(Table.from_dict({"dummy": [0]}))
            op.output_expressions = []
            return op
        if t is L.ParamValuesNode:
            from hyrise_tpu.operators.param_values import ParamValues

            op = ParamValues(node.rows, node.columns, node.types)
            op.output_expressions = node.output_expressions()
            return op
        if t is L.PredicateNode:
            idx_op = self._try_composite_index_scan(node, cache)
            if idx_op is None:
                idx_op = self._try_index_scan(node, cache)
            if idx_op is not None:
                return idx_op
            left = self._translate(node.left, cache)
            op = TableScan(left, node.predicate)
            self._wire_subqueries(op, [node.predicate], cache)
            return op
        if t is L.ProjectionNode:
            left = self._translate(node.left, cache)
            op = Projection(left, node.expressions)
            self._wire_subqueries(op, node.expressions, cache)
            return op
        if t is L.AliasNode:
            left = self._translate(node.left, cache)
            return AliasOperator(left, node.names)
        if t is L.AggregateNode:
            left = self._translate(node.left, cache)
            op = Aggregate(left, node.group_by, node.aggregates,
                           dependent=node.dependent)
            self._wire_subqueries(
                op, node.group_by + node.dependent + node.aggregates, cache
            )
            return op
        if t is L.SortNode:
            left = self._translate(node.left, cache)
            return Sort(left, node.sort_items)
        if t is L.LimitNode:
            left = self._translate(node.left, cache)
            n = _literal_int(node.row_count)
            offset = _literal_int(node.offset) if node.offset is not None else 0
            return Limit(left, n, offset)
        if t is L.JoinNode:
            return self._translate_join(node, cache)
        if t is L.UnionNode:
            left = self._translate(node.left, cache)
            right = self._translate(node.right, cache)
            cls = UnionAll if node.set_mode == SetOperationMode.ALL \
                else UnionUnique
            return cls(left, right, out_exprs=node.output_refs)
        if t is L.IntersectNode:
            left = self._translate(node.left, cache)
            right = self._translate(node.right, cache)
            return Intersect(left, right, out_exprs=node.output_refs)
        if t is L.ExceptNode:
            left = self._translate(node.left, cache)
            right = self._translate(node.right, cache)
            return Difference(left, right, out_exprs=node.output_refs)
        if t is L.DistinctNode:
            left = self._translate(node.left, cache)
            return Distinct(left)
        if t is L.ValidateNode:
            from hyrise_tpu.operators.validate import Validate

            left = self._translate(node.left, cache)
            return Validate(left)
        if t is L.WindowNode:
            from hyrise_tpu.operators.window import WindowOperator

            left = self._translate(node.left, cache)
            return WindowOperator(left, node.window_expr)
        if t is L.InsertNode:
            from hyrise_tpu.operators.modification import Insert

            left = self._translate(node.left, cache)
            return Insert(node.table_name, left,
                          getattr(node, "column_names", None))
        if t is L.UpdateNode:
            from hyrise_tpu.operators.modification import Update

            left = self._translate(node.left, cache)
            op = Update(node.table_name, node.update_expressions, left)
            self._wire_subqueries(op, node.update_expressions, cache)
            return op
        if t is L.DeleteNode:
            from hyrise_tpu.operators.modification import Delete

            left = self._translate(node.left, cache)
            return Delete(node.table_name, left)
        if t is L.CreateTableNode:
            from hyrise_tpu.operators.maintenance import CreateTable

            left = self._translate(node.left, cache) if node.left else None
            return CreateTable(node.table_name, node.if_not_exists,
                               node.column_specs, left)
        if t is L.DropTableNode:
            from hyrise_tpu.operators.maintenance import DropTable

            return DropTable(node.table_name, node.if_exists)
        if t is L.CreateViewNode:
            from hyrise_tpu.operators.maintenance import CreateView

            return CreateView(node.view_name, node.if_not_exists, node.view)
        if t is L.DropViewNode:
            from hyrise_tpu.operators.maintenance import DropView

            return DropView(node.view_name, node.if_exists)
        if t is L.ImportNode:
            from hyrise_tpu.operators.import_export import Import

            return Import(node.table_name, node.file_path, node.file_format)
        if t is L.ExportNode:
            from hyrise_tpu.operators.import_export import Export

            left = self._translate(node.left, cache)
            return Export(left, node.file_path, node.file_format)
        if t is L.ChangeMetaTableNode:
            from hyrise_tpu.operators.maintenance import ChangeMetaTable

            left = self._translate(node.left, cache) if node.left else None
            return ChangeMetaTable(node.table_name, node.change_type, left,
                                   getattr(node, "update_expressions", None))
        raise LQPTranslationError(f"cannot translate {t.__name__}")

    # ------------------------------------------------------------------

    def _try_composite_index_scan(self, node: L.PredicateNode, cache):
        """Fuse a chain of >=2 equality predicates over one base table into
        a single CompositeOrderedIndex probe (ref: the reference picks a
        CompositeGroupKeyIndex for multi-predicate scans,
        index_scan_rule.cpp + composite_group_key_index.hpp:43).  Non-equi
        predicates in the chain stay as TableScans above the probe."""
        from hyrise_tpu.database import Database
        from hyrise_tpu.expression import ast as A
        from hyrise_tpu.operators.index_scan import CompositeIndexScan
        from hyrise_tpu.operators.table_scan import TableScan
        from hyrise_tpu.types import DataType

        chain: list = []
        walk = node
        while isinstance(walk, L.PredicateNode):
            chain.append(walk)
            walk = walk.left
        base_walk = walk
        while isinstance(base_walk, L.ValidateNode):
            base_walk = base_walk.left
        if not isinstance(base_walk, L.StoredTableNode):
            return None
        tname = base_walk.table_name

        def conjuncts(e):
            if isinstance(e, A.Logical) and e.op == "and":
                return conjuncts(e.children[0]) + conjuncts(e.children[1])
            return [e]

        eq = {}
        rest = []
        for pn in chain:
            for p in conjuncts(pn.predicate):
                if (
                    isinstance(p, A.Predicate)
                    and p.condition == PredicateCondition.EQUALS
                    and len(p.children) == 2
                    and isinstance(p.children[0], A.ColumnRef)
                    and p.children[0].origin == tname
                    and p.children[0].data_type() in (
                        DataType.INT, DataType.LONG, DataType.DATE,
                        DataType.STRING,
                    )
                    and isinstance(p.children[1], A.Literal)
                    and p.children[0].display_name not in eq
                ):
                    eq[p.children[0].display_name] = (p.children[1].value, p)
                else:
                    rest.append(p)
        if len(eq) < 2:
            return None
        db = Database.get()
        found = db.index_registry.composite_index_for_set(tname, eq.keys())
        if found is None:
            return None
        cols, index = found
        try:
            base = db.storage_manager.get_table(tname)
        except KeyError:
            return None
        if index._row_count_at_build != base.num_rows:
            return None  # stale: appended rows would be missed
        # equality conjuncts beyond the indexed columns remain as filters
        rest.extend(expr for name, (_, expr) in eq.items() if name not in cols)
        left = self._translate(walk, cache)
        op = CompositeIndexScan(left, tname, cols,
                                [eq[c][0] for c in cols])
        if rest:
            residual = rest[0]
            for p in rest[1:]:
                residual = A.Logical("and", residual, p)
            op = TableScan(op, residual)
            self._wire_subqueries(op, [residual], cache)
        return op

    def _try_index_scan(self, node: L.PredicateNode, cache):
        """Route a point/range predicate over an INDEXED base-table column
        to IndexScan instead of TableScan (ref: the scan-vs-index choice in
        lqp_translator.cpp:186-290 + index_scan_rule.cpp).  Requires:
        a comparison of a base column vs literal(s), an up-to-date
        OrderedIndex on that column, and an input chain that preserves the
        base table's row layout (only filters/validates below)."""
        from hyrise_tpu.database import Database
        from hyrise_tpu.expression import ast as A
        from hyrise_tpu.operators.index_scan import IndexScan
        from hyrise_tpu.types import DataType

        p = node.predicate
        supported = (
            PredicateCondition.EQUALS, PredicateCondition.LESS_THAN,
            PredicateCondition.LESS_THAN_EQUALS,
            PredicateCondition.GREATER_THAN,
            PredicateCondition.GREATER_THAN_EQUALS,
            PredicateCondition.BETWEEN_INCLUSIVE,
        )
        if not isinstance(p, A.Predicate) or p.condition not in supported:
            return None
        col = p.children[0]
        lits = p.children[1:]
        if not isinstance(col, A.ColumnRef) or not col.origin:
            return None
        if col.data_type() not in (DataType.INT, DataType.LONG,
                                   DataType.DATE, DataType.STRING):
            return None
        if not all(isinstance(v, A.Literal) for v in lits):
            return None
        if col.data_type() in (DataType.INT, DataType.LONG, DataType.DATE):
            for v in lits:
                if isinstance(v.value, float) and not v.value.is_integer():
                    # fractional bound on an integer column: int() would
                    # truncate and flip < / = answers — leave it to the
                    # type-promoting TableScan
                    return None
        # row layout must match the base table (selection masks compose)
        walk = node.left
        while isinstance(walk, (L.PredicateNode, L.ValidateNode)):
            walk = walk.left
        if not isinstance(walk, L.StoredTableNode) or (
            walk.table_name != col.origin
        ):
            return None
        db = Database.get()
        index = db.index_registry.ordered_index(col.origin, col.display_name)
        if index is None:
            return None
        try:
            base = db.storage_manager.get_table(col.origin)
        except KeyError:
            return None
        if index._row_count_at_build != base.num_rows:
            return None  # stale index: appended rows would be missed
        if walk.pruning_predicates:
            # block pruning re-packs GetTable's output, which would break
            # the index's base-table row positions; the index already
            # delivers the selectivity, so keep the base layout instead
            walk.pruning_predicates = []
        left = self._translate(node.left, cache)
        value = lits[0].value
        value2 = lits[1].value if len(lits) > 1 else None
        return IndexScan(left, col.origin, col.display_name, p.condition,
                         value, value2)

    def _translate_join(self, node: L.JoinNode, cache) -> AbstractOperator:
        left = self._translate(node.left, cache)
        right = self._translate(node.right, cache)
        if node.mode == JoinMode.CROSS or not node.predicates:
            if node.mode in (JoinMode.CROSS, JoinMode.INNER):
                return Product(left, right)
            raise LQPTranslationError(f"predicate-less {node.mode} join")
        left_cols = {e.key() for e in node.left.output_expressions()}
        right_cols = {e.key() for e in node.right.output_expressions()}
        preds: List[JoinPredicate] = []
        for p in node.predicates:
            jp = _to_join_predicate(p, left_cols, right_cols)
            if jp is None:
                # one-sided ON predicates filter that input before the join
                # (LEFT JOIN ... ON right_only_condition semantics)
                side = _side_of(p, left_cols, right_cols)
                if side == "left":
                    left = TableScan(left, p)
                    continue
                if side == "right":
                    right = TableScan(right, p)
                    continue
                raise LQPTranslationError(
                    f"join predicate {p.description()} does not separate sides"
                )
            preds.append(jp)
        # equi predicates first (primary), then others
        preds.sort(key=lambda jp: jp.condition != PredicateCondition.EQUALS)
        op = Join(left, right, node.mode, preds)
        # demand-driven output pruning: the join assembles (gathers at
        # expansion width) ONLY the columns its ancestors reference.
        # Spent join keys otherwise ride through every later join — Q7's
        # final SF1 join gathered 15 columns at 6M rows where 5 are used
        # (ref: column_pruning_rule.cpp prunes via inserted projections;
        # here the join itself narrows, since the gathers happen in it).
        op.required_output_keys = self._demands.get(id(node))
        return op

    def _wire_subqueries(self, op: AbstractOperator,
                         expressions: List[ast.Expression], cache) -> None:
        for e in expressions:
            for sub in e.walk():
                if isinstance(sub, ast.Subquery):
                    if sub.is_correlated():
                        raise LQPTranslationError(
                            "correlated subquery was not rewritten to a join"
                        )
                    sub_op = self._translate(sub.lqp, cache)
                    op.uncorrelated_subquery_plans[sub.key()] = sub_op


def _to_join_predicate(p: ast.Expression, left_cols, right_cols):
    if not isinstance(p, ast.Predicate) or len(p.children) != 2:
        return None
    a, b = p.children
    a_side = _side_of(a, left_cols, right_cols)
    b_side = _side_of(b, left_cols, right_cols)
    if a_side == "left" and b_side == "right":
        return JoinPredicate(a, b, p.condition)
    if a_side == "right" and b_side == "left":
        cond = FLIPPED_CONDITION.get(p.condition)
        if cond is None:
            return None
        return JoinPredicate(b, a, cond)
    return None


def _side_of(e: ast.Expression, left_cols, right_cols) -> Optional[str]:
    cols = [c.key() for c in e.referenced_columns()]
    if not cols:
        return None
    if all(c in left_cols for c in cols):
        return "left"
    if all(c in right_cols for c in cols):
        return "right"
    return None


def _literal_int(e: ast.Expression) -> int:
    if isinstance(e, ast.Literal) and isinstance(e.value, int):
        return e.value
    raise LQPTranslationError("LIMIT/OFFSET must be integer literals")

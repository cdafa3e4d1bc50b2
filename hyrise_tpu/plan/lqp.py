"""Logical query plan nodes (ref: src/lib/logical_query_plan/ — 28 node
types, abstract_lqp_node.hpp:20-49).

Nodes are lightweight host objects; columns are identified by Expression
objects (an LQP column IS the expression that produced it, as in the
reference).  Optimizer rules rewrite trees destructively via input
reassignment, mirroring the reference's API shape but without the
shared-output bookkeeping (each node instance appears once per plan; shared
subplans are deduplicated at translation).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from hyrise_tpu.expression import ast
from hyrise_tpu.types import DataType, JoinMode, SetOperationMode, SortMode


class LQPNode:
    def __init__(self, left: Optional["LQPNode"] = None,
                 right: Optional["LQPNode"] = None):
        self.left = left
        self.right = right

    # --- structure ---------------------------------------------------------

    def inputs(self) -> List["LQPNode"]:
        return [n for n in (self.left, self.right) if n is not None]

    def output_expressions(self) -> List[ast.Expression]:
        """Columns this node produces (default: forward left input)."""
        return self.left.output_expressions() if self.left else []

    def walk(self):
        yield self
        for n in self.inputs():
            yield from n.walk()

    def node_expressions(self) -> List[ast.Expression]:
        """Expressions this node itself holds (predicates etc.), used by
        rules scanning for subqueries/columns."""
        return []

    def description(self) -> str:
        return type(self).__name__

    def tree_string(self, indent: int = 0) -> str:
        lines = [" " * indent + self.description()]
        for n in self.inputs():
            lines.append(n.tree_string(indent + 2))
        return "\n".join(lines)

    def semantic_key(self):
        """Hashable plan shape for plan caching."""
        return (
            type(self).__name__,
            self._self_key(),
            tuple(n.semantic_key() for n in self.inputs()),
        )

    def _self_key(self):
        return ()


class StoredTableNode(LQPNode):
    """Ref: stored_table_node.cpp — carries pruned chunk/column ids set by
    optimizer rules; here pruned column names + block pruning hints."""

    def __init__(self, table_name: str):
        super().__init__()
        self.table_name = table_name
        self.pruned_column_names: List[str] = []
        # simple comparisons usable for block skipping, attached by
        # BlockPruningRule and consumed by GetTable (ref: pruned_chunk_ids
        # on stored_table_node.cpp + get_table.hpp:57)
        self.pruning_predicates: List[ast.Expression] = []
        self._columns: Optional[List[ast.ColumnRef]] = None
        # DML target scans carry a hidden physical-row-id column (the TPU
        # analogue of the reference's RowID pos lists).
        self.include_row_ids = False
        self.rowid_ref: Optional[ast.ColumnRef] = None

    def set_columns(self, columns: List[ast.ColumnRef]):
        self._columns = columns

    def enable_row_ids(self) -> ast.ColumnRef:
        if self.rowid_ref is None:
            self.include_row_ids = True
            self.rowid_ref = ast.ColumnRef(
                "__rowid__", DataType.LONG, False, origin=self.table_name
            )
        return self.rowid_ref

    def output_expressions(self):
        assert self._columns is not None, "StoredTableNode not bound"
        out = [
            c for c in self._columns
            if c.display_name not in self.pruned_column_names
        ]
        if self.include_row_ids:
            out.append(self.rowid_ref)
        return out

    def all_columns(self):
        return list(self._columns or [])

    def description(self):
        return f"StoredTable({self.table_name})"

    def _self_key(self):
        return (self.table_name, tuple(self.pruned_column_names))


class StaticTableNode(LQPNode):
    """Literal table (ref: static_table_node.hpp)."""

    def __init__(self, table, columns: List[ast.ColumnRef]):
        super().__init__()
        self.table = table
        self._columns = columns

    def output_expressions(self):
        return list(self._columns)

    def _self_key(self):
        return (id(self.table),)


class DummyTableNode(LQPNode):
    """SELECT without FROM (ref: dummy_table_node.hpp)."""

    def output_expressions(self):
        return []


class ParamValuesNode(LQPNode):
    """Parameterized multi-row VALUES source for prepared INSERTs: the
    rows materialize host-side from the bound parameters at execution
    (one tiny upload), so the stored plan — and every downstream compiled
    stage keyed on table signature — is reused across bindings (ref: the
    reference binding placeholders into the cached PQP,
    prepared_plan.cpp + operators/insert.cpp)."""

    def __init__(self, rows, columns, types):
        super().__init__()
        self.rows = [list(r) for r in rows]  # rows of ast expressions
        self.columns = list(columns)
        self.types = dict(types)  # column -> DataType
        self._outputs = [
            ast.ColumnRef(c, self.types[c], True) for c in self.columns
        ]

    def output_expressions(self):
        return self._outputs

    def node_expressions(self):
        return [e for r in self.rows for e in r]

    def description(self):
        return f"ParamValues({len(self.rows)}x{len(self.columns)})"

    def _self_key(self):
        return (
            tuple(tuple(e.key() for e in r) for r in self.rows),
            tuple(self.columns),
        )


class PredicateNode(LQPNode):
    def __init__(self, predicate: ast.Expression, left: LQPNode):
        super().__init__(left)
        self.predicate = predicate

    def node_expressions(self):
        return [self.predicate]

    def description(self):
        return f"Predicate({self.predicate.description()})"

    def _self_key(self):
        return (self.predicate.key(),)


class ProjectionNode(LQPNode):
    def __init__(self, expressions: Sequence[ast.Expression], left: LQPNode):
        super().__init__(left)
        self.expressions = list(expressions)

    def output_expressions(self):
        return list(self.expressions)

    def node_expressions(self):
        return list(self.expressions)

    def description(self):
        return "Projection(" + ", ".join(e.description() for e in self.expressions) + ")"

    def _self_key(self):
        return tuple(e.key() for e in self.expressions)


class AliasNode(LQPNode):
    """Column rename layer (ref: alias_node.hpp)."""

    def __init__(self, expressions: Sequence[ast.Expression],
                 names: Sequence[str], left: LQPNode):
        super().__init__(left)
        self.expressions = list(expressions)
        self.names = list(names)

    def output_expressions(self):
        return list(self.expressions)

    def node_expressions(self):
        return list(self.expressions)

    def description(self):
        return f"Alias({', '.join(self.names)})"

    def _self_key(self):
        return (tuple(self.names), tuple(e.key() for e in self.expressions))


class AggregateNode(LQPNode):
    def __init__(self, group_by: Sequence[ast.Expression],
                 aggregates: Sequence[ast.Expression], left: LQPNode):
        super().__init__(left)
        self.group_by = list(group_by)
        self.aggregates = list(aggregates)
        # functionally-dependent columns (determined by a unique key in
        # group_by): output per-group via representative rows, keeping
        # their ORIGINAL expression identity (ref: the reference rewrites
        # these to ANY() — dependent_group_by_reduction_rule.cpp)
        self.dependent: List[ast.Expression] = []

    def output_expressions(self):
        return self.group_by + self.dependent + self.aggregates

    def node_expressions(self):
        return self.group_by + self.dependent + self.aggregates

    def description(self):
        return (
            "Aggregate(by=["
            + ", ".join(e.description() for e in self.group_by)
            + "], aggs=["
            + ", ".join(e.description() for e in self.aggregates)
            + "])"
        )

    def _self_key(self):
        return (
            tuple(e.key() for e in self.group_by),
            tuple(e.key() for e in self.dependent),
            tuple(e.key() for e in self.aggregates),
        )


class JoinNode(LQPNode):
    def __init__(self, mode: JoinMode,
                 predicates: Sequence[ast.Expression],
                 left: LQPNode, right: LQPNode):
        super().__init__(left, right)
        self.mode = mode
        self.predicates = list(predicates)  # ast.Predicate trees

    def output_expressions(self):
        if self.mode in (JoinMode.SEMI, JoinMode.ANTI_NULL_AS_TRUE,
                         JoinMode.ANTI_NULL_AS_FALSE):
            return self.left.output_expressions()
        return self.left.output_expressions() + self.right.output_expressions()

    def node_expressions(self):
        return list(self.predicates)

    def description(self):
        preds = ", ".join(p.description() for p in self.predicates)
        return f"Join({self.mode.value}, [{preds}])"

    def _self_key(self):
        return (self.mode, tuple(p.key() for p in self.predicates))


class SortNode(LQPNode):
    def __init__(self, sort_items: Sequence[Tuple[ast.Expression, SortMode]],
                 left: LQPNode):
        super().__init__(left)
        self.sort_items = list(sort_items)

    def node_expressions(self):
        return [e for e, _ in self.sort_items]

    def description(self):
        return "Sort(" + ", ".join(
            f"{e.description()} {m.value}" for e, m in self.sort_items
        ) + ")"

    def _self_key(self):
        return tuple((e.key(), m) for e, m in self.sort_items)


class LimitNode(LQPNode):
    def __init__(self, row_count: ast.Expression,
                 offset: Optional[ast.Expression], left: LQPNode):
        super().__init__(left)
        self.row_count = row_count
        self.offset = offset

    def node_expressions(self):
        return [self.row_count] + ([self.offset] if self.offset else [])

    def description(self):
        return f"Limit({self.row_count.description()})"

    def _self_key(self):
        return (
            self.row_count.key(),
            self.offset.key() if self.offset else None,
        )


def _mint_setop_outputs(left: LQPNode, right: LQPNode) -> List[ast.ColumnRef]:
    """Fresh column identities for a set operation's outputs.

    A set op's columns are NEW columns, not the first branch's expressions:
    forwarding branch-1 identities lets a literal like `'s' AS sale_type`
    leak upward, so a predicate on the union column folds into nonsense
    ('s' = 'w') and two references to the same union (CTE self-joins,
    TPC-DS q74/q4/q11) alias each other.  (Ref: union_node.cpp also
    exposes left outputs, but its columns are positional, not identities.)
    """
    outs: List[ast.ColumnRef] = []
    rights = right.output_expressions()
    for i, e in enumerate(left.output_expressions()):
        r = rights[i] if i < len(rights) else e
        name = getattr(e, "display_name", None) or e.description()
        outs.append(ast.ColumnRef(
            name, e.data_type(), bool(e.nullable()) or bool(r.nullable()),
            origin="setop",
        ))
    return outs


class _SetOpNode(LQPNode):
    def __init__(self, mode: SetOperationMode, left: LQPNode, right: LQPNode):
        super().__init__(left, right)
        self.set_mode = mode
        self.output_refs = _mint_setop_outputs(left, right)

    def output_expressions(self):
        return list(self.output_refs)

    def _self_key(self):
        return (self.set_mode,)


class UnionNode(_SetOpNode):
    def description(self):
        return f"Union({self.set_mode.value})"


class IntersectNode(_SetOpNode):
    pass


class ExceptNode(_SetOpNode):
    pass


class DistinctNode(LQPNode):
    """SELECT DISTINCT (the reference models this as AggregateNode over all
    columns; we keep an explicit node for the set-op machinery)."""


class ValidateNode(LQPNode):
    """MVCC visibility filter (ref: validate_node.hpp)."""


class WindowNode(LQPNode):
    """Window function computation — adds one column
    (ref: window_node.hpp; the reference cannot execute these)."""

    def __init__(self, window_expr: ast.WindowExpression, left: LQPNode):
        super().__init__(left)
        self.window_expr = window_expr

    def output_expressions(self):
        return self.left.output_expressions() + [self.window_expr]

    def node_expressions(self):
        return [self.window_expr]

    def _self_key(self):
        return (self.window_expr.key(),)


# ----------------------------------------------------------------- DML/DDL


class InsertNode(LQPNode):
    def __init__(self, table_name: str, left: LQPNode):
        super().__init__(left)
        self.table_name = table_name

    def output_expressions(self):
        return []

    def _self_key(self):
        return (self.table_name,)


class UpdateNode(LQPNode):
    def __init__(self, table_name: str, update_expressions, left: LQPNode):
        super().__init__(left)
        self.table_name = table_name
        self.update_expressions = list(update_expressions)

    def output_expressions(self):
        return []

    def node_expressions(self):
        return list(self.update_expressions)

    def _self_key(self):
        return (self.table_name, tuple(e.key() for e in self.update_expressions))


class DeleteNode(LQPNode):
    def __init__(self, table_name: str, left: LQPNode):
        super().__init__(left)
        self.table_name = table_name

    def output_expressions(self):
        return []

    def _self_key(self):
        return (self.table_name,)


class CreateTableNode(LQPNode):
    def __init__(self, table_name: str, if_not_exists: bool,
                 column_specs=None, left: Optional[LQPNode] = None):
        super().__init__(left)
        self.table_name = table_name
        self.if_not_exists = if_not_exists
        self.column_specs = column_specs

    def output_expressions(self):
        return []


class DropTableNode(LQPNode):
    def __init__(self, table_name: str, if_exists: bool):
        super().__init__()
        self.table_name = table_name
        self.if_exists = if_exists

    def output_expressions(self):
        return []


class CreateViewNode(LQPNode):
    def __init__(self, view_name: str, if_not_exists: bool, view):
        super().__init__()
        self.view_name = view_name
        self.if_not_exists = if_not_exists
        self.view = view

    def output_expressions(self):
        return []


class DropViewNode(LQPNode):
    def __init__(self, view_name: str, if_exists: bool):
        super().__init__()
        self.view_name = view_name
        self.if_exists = if_exists

    def output_expressions(self):
        return []


class CreatePreparedPlanNode(LQPNode):
    def __init__(self, name: str, prepared_plan):
        super().__init__()
        self.name = name
        self.prepared_plan = prepared_plan

    def output_expressions(self):
        return []


class ImportNode(LQPNode):
    def __init__(self, table_name: str, file_path: str, file_format: Optional[str]):
        super().__init__()
        self.table_name = table_name
        self.file_path = file_path
        self.file_format = file_format

    def output_expressions(self):
        return []


class ExportNode(LQPNode):
    def __init__(self, file_path: str, file_format: Optional[str], left: LQPNode):
        super().__init__(left)
        self.file_path = file_path
        self.file_format = file_format

    def output_expressions(self):
        return []

    def node_expressions(self):
        # exports write every input column — none may be pruned
        return self.left.output_expressions() if self.left else []


class ChangeMetaTableNode(LQPNode):
    """INSERT/UPDATE/DELETE on meta_* tables (ref: change_meta_table.hpp:26)."""

    def __init__(self, table_name: str, change_type: str,
                 left: Optional[LQPNode] = None, right: Optional[LQPNode] = None):
        super().__init__(left, right)
        self.table_name = table_name
        self.change_type = change_type  # insert | update | delete

    def output_expressions(self):
        return []

    def node_expressions(self):
        out = list(getattr(self, "update_expressions", []) or [])
        if self.left is not None:
            out.extend(self.left.output_expressions())
        return out


# ------------------------------------------------------------------ utils


def map_tree(node: LQPNode, fn) -> LQPNode:
    """Bottom-up rewrite: fn(node) may return a replacement node."""
    if node.left is not None:
        node.left = map_tree(node.left, fn)
    if node.right is not None:
        node.right = map_tree(node.right, fn)
    return fn(node)


def find_nodes(node: LQPNode, cls) -> List[LQPNode]:
    return [n for n in node.walk() if isinstance(n, cls)]

"""Parsed SQL statement AST (host-side; the analogue of the reference's
vendored hsql parser output, third_party/sql-parser).

Expressions inside statements reuse hyrise_tpu.expression.ast nodes plus the
parse-time-only `UnresolvedColumn` / `Star` placeholders resolved by the
SQL translator.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple, Union

from hyrise_tpu.expression import ast
from hyrise_tpu.types import DataType, JoinMode, SortMode


class UnresolvedColumn(ast.Expression):
    """Column identifier before scope resolution: ('t', 'a') or ('a',)."""

    def __init__(self, parts: Tuple[str, ...]):
        self.children = []
        self.parts = tuple(parts)

    def key(self):
        return ("unresolved", self.parts)

    def data_type(self):
        raise RuntimeError(f"unresolved column {'.'.join(self.parts)}")

    def description(self):
        return ".".join(self.parts)


class Star(ast.Expression):
    """SELECT * or t.*"""

    def __init__(self, table: Optional[str] = None):
        self.children = []
        self.table = table

    def key(self):
        return ("star", self.table)

    def description(self):
        return f"{self.table}.*" if self.table else "*"


class SelectSubquery(ast.Expression):
    """Parse-time subquery placeholder: holds the SelectStatement; the
    translator turns it into ast.Subquery with a translated LQP."""

    _ids = iter(range(1 << 62))

    def __init__(self, select: "SelectStatement"):
        self.children = []
        self.select = select
        self._id = next(SelectSubquery._ids)

    def key(self):
        return ("selectsub", self._id)

    def description(self):
        return "(SELECT ...)"


# ------------------------------------------------------------- table refs


@dataclass
class NamedTable:
    name: str
    alias: Optional[str] = None
    column_aliases: Optional[List[str]] = None


@dataclass
class DerivedTable:
    select: "SelectStatement"
    alias: str
    column_aliases: Optional[List[str]] = None


@dataclass
class JoinRef:
    left: "TableRef"
    right: "TableRef"
    join_type: str  # inner/left/right/full/cross
    condition: Optional[ast.Expression] = None
    using_columns: Optional[List[str]] = None
    natural: bool = False


TableRef = Union[NamedTable, DerivedTable, JoinRef]


# ------------------------------------------------------------- statements


@dataclass
class OrderByItem:
    expr: ast.Expression
    ascending: bool = True
    nulls_first: Optional[bool] = None  # None = SQL default per direction

    @property
    def sort_mode(self) -> SortMode:
        nf = self.nulls_first
        if nf is None:
            # our default matches the reference tests: NULLS FIRST for ASC
            nf = True if self.ascending else False
        if self.ascending:
            return SortMode.ASC_NULLS_FIRST if nf else SortMode.ASC_NULLS_LAST
        return SortMode.DESC_NULLS_FIRST if nf else SortMode.DESC_NULLS_LAST


@dataclass
class WithClause:
    name: str
    select: "SelectStatement"
    column_aliases: Optional[List[str]] = None


@dataclass
class SelectStatement:
    select_list: List[Tuple[ast.Expression, Optional[str]]] = field(default_factory=list)
    distinct: bool = False
    from_clause: Optional[TableRef] = None
    where: Optional[ast.Expression] = None
    group_by: List[ast.Expression] = field(default_factory=list)
    having: Optional[ast.Expression] = None
    order_by: List[OrderByItem] = field(default_factory=list)
    limit: Optional[ast.Expression] = None
    offset: Optional[ast.Expression] = None
    with_clauses: List[WithClause] = field(default_factory=list)
    set_op: Optional[Tuple[str, bool, "SelectStatement"]] = None  # (kind, all, rhs)
    # GROUP BY ROLLUP/CUBE/GROUPING SETS: index lists into group_by, one
    # per grouping set (None = plain GROUP BY)
    grouping_sets: Optional[List[List[int]]] = None


@dataclass
class InsertStatement:
    table_name: str
    columns: Optional[List[str]]
    values: Optional[List[List[ast.Expression]]]  # VALUES rows
    select: Optional[SelectStatement]  # INSERT ... SELECT


@dataclass
class UpdateStatement:
    table_name: str
    assignments: List[Tuple[str, ast.Expression]]
    where: Optional[ast.Expression]


@dataclass
class DeleteStatement:
    table_name: str
    where: Optional[ast.Expression]


@dataclass
class ColumnSpec:
    name: str
    data_type: DataType
    nullable: bool = True
    primary_key: bool = False


@dataclass
class CreateTableStatement:
    table_name: str
    if_not_exists: bool
    columns: Optional[List[ColumnSpec]]
    as_select: Optional[SelectStatement]


@dataclass
class DropTableStatement:
    table_name: str
    if_exists: bool


@dataclass
class CreateViewStatement:
    view_name: str
    if_not_exists: bool
    column_aliases: Optional[List[str]]
    select: SelectStatement


@dataclass
class DropViewStatement:
    view_name: str
    if_exists: bool


@dataclass
class PrepareStatement:
    name: str
    statement: "Statement"


@dataclass
class ExecuteStatement:
    name: str
    parameters: List[ast.Expression]


@dataclass
class CopyStatement:
    table_name: str
    file_path: str
    direction: str  # 'from' (import) | 'to' (export)
    file_format: Optional[str] = None


@dataclass
class TransactionStatement:
    command: str  # begin | commit | rollback


@dataclass
class ShowStatement:
    what: str  # tables | columns
    table_name: Optional[str] = None


@dataclass
class ExplainStatement:
    statement: "Statement"


Statement = Union[
    SelectStatement,
    InsertStatement,
    UpdateStatement,
    DeleteStatement,
    CreateTableStatement,
    DropTableStatement,
    CreateViewStatement,
    DropViewStatement,
    PrepareStatement,
    ExecuteStatement,
    CopyStatement,
    TransactionStatement,
    ShowStatement,
    ExplainStatement,
]

"""DDL / maintenance operators (ref: operators/maintenance/ —
create_table.hpp, drop_table.hpp, create_view.hpp, drop_view.hpp,
create_prepared_plan.hpp; plus change_meta_table.hpp:26)."""

from __future__ import annotations

from typing import List, Optional

from hyrise_tpu.concurrency.mvcc import MvccData
from hyrise_tpu.database import Database
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import ColumnDefinition


class CreateTable(AbstractReadOnlyOperator):
    def __init__(self, table_name: str, if_not_exists: bool,
                 column_specs=None, source_op=None):
        super().__init__(source_op)
        self.table_name = table_name
        self.if_not_exists = if_not_exists
        self.column_specs = column_specs

    def _on_execute(self) -> Optional[Table]:
        sm = Database.get().storage_manager
        if sm.has_table(self.table_name):
            if self.if_not_exists:
                return None
            raise ValueError(f"table {self.table_name!r} already exists")
        if self._left is not None:  # CREATE TABLE AS SELECT
            src = self.input_table_left().materialize()
            table = Table(src.column_names, src.columns, src.num_rows)
        else:
            defs = [
                ColumnDefinition(c.name, c.data_type, c.nullable)
                for c in self.column_specs
            ]
            table = Table.empty(defs)
            pk = tuple(c.name for c in self.column_specs if c.primary_key)
            if pk:
                from hyrise_tpu.storage.table import TableKeyConstraint

                table.key_constraints.append(TableKeyConstraint(pk, True))
        table.mvcc = MvccData(table.capacity, table.num_rows, initial_cid=0)
        sm.add_table(self.table_name, table)
        return None


class DropTable(AbstractReadOnlyOperator):
    def __init__(self, table_name: str, if_exists: bool):
        super().__init__()
        self.table_name = table_name
        self.if_exists = if_exists

    def _on_execute(self) -> Optional[Table]:
        sm = Database.get().storage_manager
        if not sm.has_table(self.table_name):
            if self.if_exists:
                return None
            raise KeyError(f"no table named {self.table_name!r}")
        sm.drop_table(self.table_name)
        return None


class CreateView(AbstractReadOnlyOperator):
    def __init__(self, view_name: str, if_not_exists: bool, view):
        super().__init__()
        self.view_name = view_name
        self.if_not_exists = if_not_exists
        self.view = view

    def _on_execute(self) -> Optional[Table]:
        sm = Database.get().storage_manager
        if sm.has_view(self.view_name) and self.if_not_exists:
            return None
        sm.add_view(self.view_name, self.view)
        return None


class DropView(AbstractReadOnlyOperator):
    def __init__(self, view_name: str, if_exists: bool):
        super().__init__()
        self.view_name = view_name
        self.if_exists = if_exists

    def _on_execute(self) -> Optional[Table]:
        sm = Database.get().storage_manager
        if not sm.has_view(self.view_name):
            if self.if_exists:
                return None
            raise KeyError(f"no view named {self.view_name!r}")
        sm.drop_view(self.view_name)
        return None


class ChangeMetaTable(AbstractReadOnlyOperator):
    """Mutations on meta_* tables (ref: operators/change_meta_table.hpp:26).
    UPDATE flows pass the pre-change rows (left input) and new values."""

    def __init__(self, table_name: str, change_type: str, left=None,
                 update_expressions=None):
        super().__init__(left)
        self.table_name = table_name
        self.change_type = change_type
        self.update_expressions = update_expressions

    def _on_execute(self) -> Optional[Table]:
        mtm = Database.get().meta_table_manager
        if self.change_type == "insert":
            src = self.input_table_left()
            for row in _rows_as_dicts(src):
                mtm.insert_row(self.table_name, row)
            return None
        if self.change_type == "update":
            src = self.input_table_left()
            cmap = self._column_map(self._left)
            ev = self.make_evaluator(src, cmap)
            names = [n for n in src.column_names]
            new_cols = [
                ev.evaluate(e).to_column() for e in self.update_expressions
            ]
            new_table = Table(names, new_cols, src.num_rows)
            for old_row, new_row in zip(_rows_as_dicts(src), _rows_as_dicts(new_table)):
                mtm.update_row(self.table_name, old_row, new_row)
            return None
        raise NotImplementedError(self.change_type)


def _rows_as_dicts(table: Table):
    cols = {n: c.to_pylist(table.num_rows)
            for n, c in zip(table.column_names, table.columns)}
    for i in range(table.num_rows):
        yield {n: cols[n][i] for n in table.column_names}

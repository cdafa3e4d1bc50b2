"""File I/O operators (ref: operators/import.hpp:23, export.hpp:24)."""

from __future__ import annotations

from typing import Optional

from hyrise_tpu.database import Database
from hyrise_tpu.operators.base import AbstractReadOnlyOperator
from hyrise_tpu.storage.table import Table
from hyrise_tpu.utils import load_table as io


class Import(AbstractReadOnlyOperator):
    def __init__(self, table_name: str, file_path: str,
                 file_format: Optional[str] = None):
        super().__init__()
        self.table_name = table_name
        self.file_path = file_path
        self.file_format = file_format

    def _on_execute(self) -> Optional[Table]:
        table = io.load_table(self.file_path)
        sm = Database.get().storage_manager
        if sm.has_table(self.table_name):
            sm.replace_table(self.table_name, table)
        else:
            sm.add_table(self.table_name, table)
        return None


class Export(AbstractReadOnlyOperator):
    def __init__(self, in_op, file_path: str, file_format: Optional[str] = None):
        super().__init__(in_op)
        self.file_path = file_path
        self.file_format = file_format

    def _on_execute(self) -> Optional[Table]:
        table = self.input_table_left()
        fmt = self.file_format
        if fmt is None:
            fmt = (
                "csv" if self.file_path.endswith(".csv")
                else "binary" if self.file_path.endswith((".npz", ".bin"))
                else "csv"
            )
        if fmt == "csv":
            io.write_csv(table, self.file_path)
        else:
            io.save_binary(table, self.file_path)
        return None

"""Catalog of tables, views and prepared plans.

Ref: storage/storage_manager.hpp:23-62 (name -> table/view/prepared-plan
maps) — same surface, host-side Python.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

from hyrise_tpu.storage.table import Table


class LQPView:
    """Named logical-plan snapshot for CREATE VIEW (ref: storage/lqp_view.hpp)."""

    def __init__(self, lqp, column_names: Optional[List[str]] = None):
        self.lqp = lqp
        self.column_names = column_names


class PreparedPlan:
    """Parameterized plan for PREPARE/EXECUTE (ref: storage/prepared_plan.hpp).

    Holds the OPTIMIZED LQP built once at PREPARE time: re-translating per
    EXECUTE would mint fresh column cids and miss every compiled-stage
    cache entry, recompiling the XLA stages for each new parameter value."""

    def __init__(self, lqp, parameter_ids, statement=None):
        self.lqp = lqp
        self.parameter_ids = parameter_ids
        self.statement = statement


def packed_encoding_enabled() -> bool:
    """Consult the `storage.packed_encoding` setting (default on)."""
    try:
        from hyrise_tpu.database import Database

        sm = Database.get().settings_manager
        if sm.has_setting("storage.packed_encoding"):
            return sm.get_setting("storage.packed_encoding").get() != "off"
    except Exception:
        pass
    return True


class StorageManager:
    def __init__(self):
        self._tables: Dict[str, Table] = {}
        self._views: Dict[str, LQPView] = {}
        self._prepared_plans: Dict[str, PreparedPlan] = {}
        # name -> per-column DColumn map for distributed execution
        # (parallel/dexec.py); the single-chip Table stays registered for
        # schema binding, statistics and fallback execution
        self._sharded: Dict[str, object] = {}
        self._lock = threading.RLock()

    # -------------------------------------------------------------- tables
    def add_table(self, name: str, table: Table, encode: bool = False) -> None:
        """Register a table.  `encode=True` (bulk-load paths: benchmark
        generators, file import) applies FOR/bit-packed device encoding to
        eligible columns, mirroring the reference's encode-after-generate
        step (ref: abstract_table_generator.cpp — generate then
        ChunkEncoder::encode_chunks per EncodingConfig)."""
        with self._lock:
            if name in self._tables or name in self._views:
                raise ValueError(f"table or view {name!r} already exists")
            if encode and packed_encoding_enabled():
                table.encode_packed()
            self._tables[name] = table

    def drop_table(self, name: str) -> None:
        with self._lock:
            if name not in self._tables:
                raise KeyError(f"no table named {name!r}")
            del self._tables[name]

    def replace_table(self, name: str, table: Table) -> None:
        with self._lock:
            self._tables[name] = table

    def get_table(self, name: str) -> Table:
        with self._lock:
            if name not in self._tables:
                raise KeyError(f"no table named {name!r}")
            return self._tables[name]

    def has_table(self, name: str) -> bool:
        return name in self._tables

    def table_names(self) -> List[str]:
        return sorted(self._tables)

    # ------------------------------------------------------ sharded tables
    def add_sharded_table(self, name: str, sharded) -> None:
        """Register a mesh-partitioned twin (parallel/dtable.ShardedBase)
        for an existing table; SELECTs over it execute distributed."""
        with self._lock:
            if name not in self._tables:
                raise KeyError(f"no table named {name!r} to shard")
            self._sharded[name] = sharded

    def get_sharded_table(self, name: str):
        return self._sharded[name]

    def is_sharded(self, name: str) -> bool:
        return name in self._sharded

    def has_sharded_tables(self) -> bool:
        return bool(self._sharded)

    def drop_sharded_table(self, name: str) -> None:
        self._sharded.pop(name, None)

    # --------------------------------------------------------------- views
    def add_view(self, name: str, view: LQPView) -> None:
        with self._lock:
            if name in self._tables or name in self._views:
                raise ValueError(f"table or view {name!r} already exists")
            self._views[name] = view

    def drop_view(self, name: str) -> None:
        with self._lock:
            if name not in self._views:
                raise KeyError(f"no view named {name!r}")
            del self._views[name]

    def get_view(self, name: str) -> LQPView:
        return self._views[name]

    def has_view(self, name: str) -> bool:
        return name in self._views

    def view_names(self) -> List[str]:
        return sorted(self._views)

    # ------------------------------------------------------ prepared plans
    def add_prepared_plan(self, name: str, plan: PreparedPlan) -> None:
        with self._lock:
            self._prepared_plans[name] = plan

    def get_prepared_plan(self, name: str) -> PreparedPlan:
        try:
            return self._prepared_plans[name]
        except KeyError:
            raise KeyError(
                f"no prepared statement named {name!r} — PREPARE it first"
            ) from None

    def has_prepared_plan(self, name: str) -> bool:
        return name in self._prepared_plans

    def drop_prepared_plan(self, name: str) -> None:
        del self._prepared_plans[name]

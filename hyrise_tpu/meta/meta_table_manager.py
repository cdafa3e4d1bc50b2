"""SQL-queryable system tables (ref: utils/meta_table_manager.hpp + the 14
meta tables under utils/meta_tables/).  Tables are generated on access and
named meta_<x>; writable ones (settings, plugins, exec) support
INSERT/UPDATE/DELETE through the ChangeMetaTable operator.
"""

from __future__ import annotations

import os
import platform
import time
from typing import Callable, Dict, List

from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType

META_PREFIX = "meta_"


class MetaTableManager:
    def __init__(self, db):
        self._db = db
        self._generators: Dict[str, Callable[[], Table]] = {
            "tables": self._meta_tables,
            "columns": self._meta_columns,
            "chunks": self._meta_chunks,
            "chunk_sort_orders": self._meta_chunk_sort_orders,
            "segments": self._meta_segments,
            "segments_accurate": self._meta_segments,
            "settings": self._meta_settings,
            "plugins": self._meta_plugins,
            "log": self._meta_log,
            "exec": self._meta_exec,
            "system_information": self._meta_system_information,
            "system_utilization": self._meta_system_utilization,
            "transactions": self._meta_transactions,
            "plan_cache": self._meta_plan_cache,
            "indexes": self._meta_indexes,
            "shards": self._meta_shards,
        }

    def table_names(self) -> List[str]:
        return sorted(self._generators)

    def has_table(self, name: str) -> bool:
        return name.startswith(META_PREFIX) and name[len(META_PREFIX):] in self._generators

    def generate_table(self, name: str) -> Table:
        key = name[len(META_PREFIX):] if name.startswith(META_PREFIX) else name
        return self._generators[key]()

    # -------------------------------------------------------------- writable

    def can_insert(self, name: str) -> bool:
        return self._key(name) in ("exec",)

    def can_update(self, name: str) -> bool:
        return self._key(name) in ("settings",)

    def can_delete(self, name: str) -> bool:
        return False

    def _key(self, name: str) -> str:
        return name[len(META_PREFIX):] if name.startswith(META_PREFIX) else name

    def update_row(self, name: str, old_row: dict, new_row: dict) -> None:
        key = self._key(name)
        if key == "settings":
            setting = self._db.settings_manager.get_setting(old_row["name"])
            setting.set(str(new_row["value"]))
        else:
            raise ValueError(f"meta table {name} is not updatable")

    def insert_row(self, name: str, row: dict) -> None:
        key = self._key(name)
        if key == "exec":
            self._db.plugin_manager.exec_user_function(
                row["plugin_name"], row["function_name"]
            )
        else:
            raise ValueError(f"meta table {name} is not insertable")

    # ------------------------------------------------------------ generators

    def _meta_tables(self) -> Table:
        sm = self._db.storage_manager
        names = sm.table_names()
        return Table.from_dict(
            {
                "table_name": names,
                "column_count": [sm.get_table(n).num_columns for n in names],
                "row_count": [sm.get_table(n).num_rows for n in names],
                "chunk_count": [1 for _ in names],
                "max_chunk_size": [sm.get_table(n).capacity for n in names],
            },
            types={
                "table_name": DataType.STRING,
                "column_count": DataType.LONG,
                "row_count": DataType.LONG,
                "chunk_count": DataType.LONG,
                "max_chunk_size": DataType.LONG,
            },
        )

    def _meta_columns(self) -> Table:
        sm = self._db.storage_manager
        rows = {"table_name": [], "column_name": [], "data_type": [], "nullable": []}
        for tname in sm.table_names():
            t = sm.get_table(tname)
            for cname, col in zip(t.column_names, t.columns):
                rows["table_name"].append(tname)
                rows["column_name"].append(cname)
                rows["data_type"].append(col.data_type.value)
                rows["nullable"].append(int(col.validity is not None))
        return Table.from_dict(
            rows,
            types={
                "table_name": DataType.STRING,
                "column_name": DataType.STRING,
                "data_type": DataType.STRING,
                "nullable": DataType.INT,
            },
        )

    def _meta_chunks(self) -> Table:
        sm = self._db.storage_manager
        rows = {"table_name": [], "chunk_id": [], "row_count": [], "invalid_row_count": []}
        for tname in sm.table_names():
            t = sm.get_table(tname)
            invalid = 0
            if t.mvcc is not None:
                invalid = t.mvcc.invalid_row_count()
            rows["table_name"].append(tname)
            rows["chunk_id"].append(0)
            rows["row_count"].append(t.num_rows)
            rows["invalid_row_count"].append(invalid)
        return Table.from_dict(
            rows,
            types={
                "table_name": DataType.STRING,
                "chunk_id": DataType.INT,
                "row_count": DataType.LONG,
                "invalid_row_count": DataType.LONG,
            },
        )

    def _meta_chunk_sort_orders(self) -> Table:
        sm = self._db.storage_manager
        rows = {"table_name": [], "chunk_id": [], "column_name": [], "order_mode": []}
        for tname in sm.table_names():
            t = sm.get_table(tname)
            for cname, mode in t.sorted_by:
                rows["table_name"].append(tname)
                rows["chunk_id"].append(0)
                rows["column_name"].append(cname)
                rows["order_mode"].append(mode.value)
        return Table.from_dict(
            rows,
            types={
                "table_name": DataType.STRING,
                "chunk_id": DataType.INT,
                "column_name": DataType.STRING,
                "order_mode": DataType.STRING,
            },
        )

    def _meta_segments(self) -> Table:
        sm = self._db.storage_manager
        rows = {
            "table_name": [],
            "column_name": [],
            "data_type": [],
            "encoding_type": [],
            "distinct_value_count": [],
            "estimated_size_in_bytes": [],
            "access_count": [],
        }
        for tname in sm.table_names():
            t = sm.get_table(tname)
            for cname, col in zip(t.column_names, t.columns):
                rows["table_name"].append(tname)
                rows["column_name"].append(cname)
                rows["data_type"].append(col.data_type.value)
                rows["encoding_type"].append(
                    "FrameOfReference" if col.is_packed
                    else "RunLength" if col.is_rle
                    else "Dictionary" if col.dictionary is not None
                    else "Unencoded"
                )
                rows["distinct_value_count"].append(
                    len(col.dictionary) if col.dictionary is not None else -1
                )
                rows["estimated_size_in_bytes"].append(
                    col.data.nbytes
                    if col.is_encoded
                    else int(col.data.size * col.data.dtype.itemsize)
                )
                rows["access_count"].append(t.access_counters.get(cname, 0))
        return Table.from_dict(
            rows,
            types={
                "table_name": DataType.STRING,
                "column_name": DataType.STRING,
                "data_type": DataType.STRING,
                "encoding_type": DataType.STRING,
                "distinct_value_count": DataType.LONG,
                "estimated_size_in_bytes": DataType.LONG,
                "access_count": DataType.LONG,
            },
        )

    def _meta_settings(self) -> Table:
        smgr = self._db.settings_manager
        names = smgr.setting_names()
        return Table.from_dict(
            {
                "name": names,
                "value": [smgr.get_setting(n).get() for n in names],
                "description": [smgr.get_setting(n).description for n in names],
            },
            types={
                "name": DataType.STRING,
                "value": DataType.STRING,
                "description": DataType.STRING,
            },
        )

    def _meta_plugins(self) -> Table:
        names = self._db.plugin_manager.loaded_plugins()
        return Table.from_dict(
            {"name": names}, types={"name": DataType.STRING}
        )

    def _meta_log(self) -> Table:
        entries = self._db.log_manager.log_entries()
        return Table.from_dict(
            {
                "timestamp": [e.timestamp for e in entries],
                "log_level": [e.log_level.value for e in entries],
                "reporter": [e.reporter for e in entries],
                "message": [e.message for e in entries],
            },
            types={
                "timestamp": DataType.DOUBLE,
                "log_level": DataType.STRING,
                "reporter": DataType.STRING,
                "message": DataType.STRING,
            },
        )

    def _meta_exec(self) -> Table:
        fns = self._db.plugin_manager.user_executable_functions()
        return Table.from_dict(
            {
                "plugin_name": [p for (p, _) in fns],
                "function_name": [f for (_, f) in fns],
            },
            types={
                "plugin_name": DataType.STRING,
                "function_name": DataType.STRING,
            },
        )

    def _meta_system_information(self) -> Table:
        import jax

        devices = jax.devices()
        return Table.from_dict(
            {
                "cpu_count": [os.cpu_count() or 1],
                "system_memory_total_bytes": [_total_memory_bytes()],
                "device_count": [len(devices)],
                "device_kind": [devices[0].device_kind if devices else "none"],
                "platform": [platform.platform()],
            },
            types={
                "cpu_count": DataType.INT,
                "system_memory_total_bytes": DataType.LONG,
                "device_count": DataType.INT,
                "device_kind": DataType.STRING,
                "platform": DataType.STRING,
            },
        )

    def _meta_system_utilization(self) -> Table:
        load1, load5, load15 = os.getloadavg() if hasattr(os, "getloadavg") else (0, 0, 0)
        return Table.from_dict(
            {
                "cpu_system_time_seconds": [time.process_time()],
                "load_average_1_min": [load1],
                "load_average_5_min": [load5],
                "load_average_15_min": [load15],
                "system_memory_free_bytes": [_free_memory_bytes()],
                "process_virtual_memory_bytes": [_process_vm_bytes()],
            },
            types={
                "cpu_system_time_seconds": DataType.DOUBLE,
                "load_average_1_min": DataType.DOUBLE,
                "load_average_5_min": DataType.DOUBLE,
                "load_average_15_min": DataType.DOUBLE,
                "system_memory_free_bytes": DataType.LONG,
                "process_virtual_memory_bytes": DataType.LONG,
            },
        )

    def _meta_transactions(self) -> Table:
        tm = self._db.transaction_manager
        snaps = dict(tm._active_snapshots)
        return Table.from_dict(
            {
                "transaction_id": list(snaps.keys()),
                "snapshot_commit_id": list(snaps.values()),
            },
            types={
                "transaction_id": DataType.LONG,
                "snapshot_commit_id": DataType.LONG,
            },
        )

    def _meta_indexes(self) -> Table:
        entries = self._db.index_registry.list_indexes()
        return Table.from_dict(
            {
                "index_type": [k for k, _, _ in entries],
                "table_name": [t for _, t, _ in entries],
                "column_names": [",".join(c) for _, _, c in entries],
            },
            types={
                "index_type": DataType.STRING,
                "table_name": DataType.STRING,
                "column_names": DataType.STRING,
            },
        )

    def _meta_shards(self) -> Table:
        """Distributed layout + executor counters (the scale-out layer's
        observability surface; no reference counterpart — single node)."""
        from hyrise_tpu.parallel import dexec

        sm = self._db.storage_manager
        rows = {"table_name": [], "n_shards": [], "rows_per_shard": [],
                "num_rows": []}
        for name in sm.table_names():
            if sm.is_sharded(name):
                sb = sm.get_sharded_table(name)
                rows["table_name"].append(name)
                rows["n_shards"].append(int(sb.row_valid.shape[0]))
                rows["rows_per_shard"].append(int(sb.row_valid.shape[1]))
                rows["num_rows"].append(int(sb.num_rows))
        for stat, val in sorted(dexec.STATS.items()):
            rows["table_name"].append(f"__stat_{stat}")
            rows["n_shards"].append(0)
            rows["rows_per_shard"].append(0)
            rows["num_rows"].append(int(val))
        return Table.from_dict(
            rows,
            types={"table_name": DataType.STRING, "n_shards": DataType.INT,
                   "rows_per_shard": DataType.INT, "num_rows": DataType.LONG},
        )

    def _meta_plan_cache(self) -> Table:
        items = self._db.default_pqp_cache.items()
        return Table.from_dict(
            {"query": [str(k) for k, _ in items]},
            types={"query": DataType.STRING},
        )


def _total_memory_bytes() -> int:
    try:
        return os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError):
        return 0


def _free_memory_bytes() -> int:
    try:
        return os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_AVPHYS_PAGES")
    except (ValueError, OSError):
        return 0


def _process_vm_bytes() -> int:
    try:
        with open("/proc/self/statm") as fh:
            return int(fh.read().split()[0]) * os.sysconf("SC_PAGE_SIZE")
    except (OSError, ValueError, IndexError):
        return 0

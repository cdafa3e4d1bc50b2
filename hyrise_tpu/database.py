"""The singleton hub owning all managers (ref: lib/hyrise.hpp:25 —
Hyrise::get() with StorageManager, TransactionManager, PluginManager,
MetaTableManager, SettingsManager, LogManager, Topology, scheduler and the
default LQP/PQP plan caches)."""

from __future__ import annotations

import threading
from typing import Optional


class Database:
    """Process-wide engine state.  `Database.get()` returns the singleton;
    tests call `Database.reset()` per test (ref: test/base_test.hpp:41)."""

    _instance: Optional["Database"] = None
    _lock = threading.Lock()

    def __init__(self):
        from hyrise_tpu.storage.storage_manager import StorageManager
        from hyrise_tpu.meta.log_manager import LogManager
        from hyrise_tpu.meta.settings_manager import SettingsManager
        from hyrise_tpu.concurrency.transaction_manager import TransactionManager
        from hyrise_tpu.scheduler.scheduler import ImmediateExecutionScheduler
        from hyrise_tpu.scheduler.topology import Topology
        from hyrise_tpu.sql.plan_cache import GDFSCache
        from hyrise_tpu.meta.meta_table_manager import MetaTableManager
        from hyrise_tpu.plugins.plugin_manager import PluginManager

        self.storage_manager = StorageManager()
        self.log_manager = LogManager()
        self.settings_manager = SettingsManager()
        self.transaction_manager = TransactionManager()
        self.topology = Topology.use_default_topology()
        self.scheduler = ImmediateExecutionScheduler()
        self.default_lqp_cache = GDFSCache(capacity=1024)
        self.default_pqp_cache = GDFSCache(capacity=1024)
        self.meta_table_manager = MetaTableManager(self)
        self.plugin_manager = PluginManager(self)
        from hyrise_tpu.storage.index import IndexRegistry

        self.index_registry = IndexRegistry()

        # scheduler selection, switchable at runtime via
        # UPDATE meta_settings (ref: the reference's --scheduler flag
        # enabling NodeQueueScheduler, bin/server.cpp / benchmarks)
        from hyrise_tpu.meta.settings_manager import Setting

        def _on_scheduler_mode(value: str) -> None:
            from hyrise_tpu.scheduler.scheduler import (
                ImmediateExecutionScheduler,
                NodeQueueScheduler,
            )

            if value == "node_queue":
                self.set_scheduler(NodeQueueScheduler(self.topology))
            else:
                self.set_scheduler(ImmediateExecutionScheduler())

        self.settings_manager.register(Setting(
            "storage.packed_encoding", "on",
            "FOR/bit-packed device encoding for bulk-loaded tables: on | off "
            "(ref: frame_of_reference_segment.hpp:39, "
            "vector_compression/compressed_vector_type.hpp:28)",
        ))
        self.settings_manager.register(Setting(
            "scheduler.mode", "immediate",
            "operator task scheduler: immediate | node_queue "
            "(per-node queues + work stealing)",
            on_change=_on_scheduler_mode,
        ))

    # ------------------------------------------------------------- singleton

    @classmethod
    def get(cls) -> "Database":
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    @classmethod
    def reset(cls) -> "Database":
        """Tear down and rebuild global state (test isolation)."""
        with cls._lock:
            if cls._instance is not None:
                cls._instance.scheduler.finish()
            cls._instance = cls()
            return cls._instance

    def set_scheduler(self, scheduler) -> None:
        old = self.scheduler
        self.scheduler = scheduler
        old.finish()

    # ---------------------------------------------------------- distribution

    def distribute(self, table_names=None, mesh=None,
                   rows_per_shard: Optional[int] = None):
        """Partition tables over a device mesh; subsequent SELECTs over
        them execute distributed (parallel/dexec.py).  Returns the
        QueryMesh used."""
        from hyrise_tpu.parallel.dtable import partition_base
        from hyrise_tpu.parallel.mesh import QueryMesh

        qmesh = mesh if mesh is not None else QueryMesh()
        names = (table_names if table_names is not None
                 else self.storage_manager.table_names())
        for name in names:
            table = self.storage_manager.get_table(name)
            self.storage_manager.add_sharded_table(
                name, partition_base(table, qmesh, rows_per_shard)
            )
        return qmesh

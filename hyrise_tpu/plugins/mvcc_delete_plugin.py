"""MVCC garbage-collection plugin (ref: plugins/mvcc_delete_plugin.hpp:34-68
— background loop doing logical delete then physical cleanup of chunks whose
deleted rows are invisible to every active snapshot).

TPU adaptation: instead of per-chunk cleanup, a table whose invalid-row
ratio exceeds RATIO_THRESHOLD is compacted wholesale — visible rows are
gathered into fresh padded arrays and a fresh MvccData; the swap happens
under the global append lock.  Safe only when no active snapshot can still
see any deleted row (lowest_active_snapshot > all end_cids being dropped).
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from hyrise_tpu.concurrency.mvcc import MAX_COMMIT_ID, MvccData
from hyrise_tpu.database import Database
from hyrise_tpu.plugins.plugin_manager import AbstractPlugin
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import padded_size

RATIO_THRESHOLD = 0.2
MIN_INVALID_ROWS = 64


class MvccDeletePlugin(AbstractPlugin):
    def __init__(self, interval_s: float = 1.0):
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def description(self) -> str:
        return "Physical MVCC garbage collection"

    def start(self) -> None:
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)

    def executable_functions(self):
        return {"CleanUpAllTables": self.clean_all}

    # ------------------------------------------------------------------

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                self.clean_all()
            except Exception as exc:  # background robustness
                Database.get().log_manager.add_message(
                    "MvccDeletePlugin", f"cleanup failed: {exc}"
                )

    def clean_all(self) -> None:
        # physical compaction shifts row numbers and swaps MvccData: it
        # must not overlap ANY in-flight statement (a reader pairing
        # pre-compaction data with post-compaction version vectors sees
        # arbitrary wrong rows) — drain and bar via exclusive_section
        from hyrise_tpu.utils.runtime import ExclusiveTimeout, exclusive_section

        try:
            with exclusive_section():
                self._clean_all_locked()
        except ExclusiveTimeout:
            return  # busy engine: skip this round, retry next period

    def _clean_all_locked(self) -> None:
        db = Database.get()
        for name in db.storage_manager.table_names():
            table = db.storage_manager.get_table(name)
            if table.mvcc is None or table.num_rows == 0:
                continue
            invalid = table.mvcc.invalid_row_count()
            if invalid < MIN_INVALID_ROWS or invalid / table.num_rows < RATIO_THRESHOLD:
                continue
            self._physical_cleanup(name, table)

    def _physical_cleanup(self, name: str, table: Table) -> None:
        from hyrise_tpu.operators.modification import _global_append_lock

        db = Database.get()
        tm = db.transaction_manager
        lowest = tm.lowest_active_snapshot_commit_id()
        barrier = lowest if lowest is not None else tm.last_commit_id
        with _global_append_lock:
            mvcc = table.mvcc
            n = table.num_rows
            begin = mvcc.begin_cids[:n]
            end = mvcc.end_cids[:n]
            tids = mvcc.tids[:n]
            # a row may be dropped iff it is deleted AND invisible to every
            # active snapshot AND not locked by a running transaction
            droppable = (end <= barrier) & (tids == 0)
            # keep everything else, including uncommitted inserts
            keep = ~droppable
            if droppable.sum() == 0:
                return
            keep_idx = np.nonzero(keep)[0]
            new_n = len(keep_idx)
            # PRESERVE the table's capacity: every compiled stage is keyed
            # on the array shapes, so a shrink (then regrow) would recompile
            # the whole statement cache twice per GC cycle.  Rows past
            # new_n are dead padding behind num_rows/row_mask.
            pad = np.zeros(table.capacity - new_n, dtype=keep_idx.dtype)
            idx_dev = jnp.asarray(np.concatenate([keep_idx, pad]))
            compacted = table.take(idx_dev, new_n)
            new_mvcc = MvccData(compacted.capacity, 0)
            new_mvcc.begin_cids[:new_n] = begin[keep_idx]
            new_mvcc.end_cids[:new_n] = end[keep_idx]
            new_mvcc.tids[:new_n] = tids[keep_idx]
            new_mvcc.max_begin_cid = int(
                begin[keep_idx].max() if new_n else 0
            )
            new_mvcc._any_end = bool((end[keep_idx] != MAX_COMMIT_ID).any())
            new_mvcc.snapshot_uncommitted_flags()
            table.columns = compacted.columns
            table.num_rows = new_n
            table.mvcc = new_mvcc
            table.statistics = None
            table.pruning_statistics = None
            db.index_registry.invalidate(name)
            db.log_manager.add_message(
                "MvccDeletePlugin",
                f"compacted {name!r}: {n} -> {new_n} rows",
            )


def factory() -> AbstractPlugin:
    return MvccDeletePlugin()

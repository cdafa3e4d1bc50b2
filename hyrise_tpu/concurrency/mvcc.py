"""Per-table MVCC version data (ref: storage/mvcc_data.hpp:15-60 —
begin/end commit-id vectors + transaction-id vector with CAS locking,
max_begin_cid whole-chunk visibility shortcut, invalid-row counting).

Host numpy arrays are the source of truth (writes are rare vs reads);
a cached device copy serves the vectorized Validate kernel and is
invalidated on every write.
"""

from __future__ import annotations

import threading
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

MAX_COMMIT_ID = np.int64(2**62)


class MvccData:
    def __init__(self, capacity: int, num_rows: int, initial_cid: int = 0):
        self.begin_cids = np.full(capacity, MAX_COMMIT_ID, dtype=np.int64)
        self.end_cids = np.full(capacity, MAX_COMMIT_ID, dtype=np.int64)
        self.tids = np.zeros(capacity, dtype=np.int64)
        # rows loaded before MVCC tracking began are visible from cid 0
        self.begin_cids[:num_rows] = initial_cid
        self._lock = threading.Lock()
        self._device_cache = None
        self.max_begin_cid = initial_cid  # all committed below this are visible
        self._any_end = False
        self._any_uncommitted = False
        self._invalid_rows = 0

    # ------------------------------------------------------------- growth

    def grow(self, new_capacity: int) -> None:
        with self._lock:
            if new_capacity <= len(self.begin_cids):
                return
            extra = new_capacity - len(self.begin_cids)
            self.begin_cids = np.concatenate(
                [self.begin_cids, np.full(extra, MAX_COMMIT_ID, dtype=np.int64)]
            )
            self.end_cids = np.concatenate(
                [self.end_cids, np.full(extra, MAX_COMMIT_ID, dtype=np.int64)]
            )
            self.tids = np.concatenate([self.tids, np.zeros(extra, dtype=np.int64)])
            self._device_cache = None

    # ------------------------------------------------------------- writes

    def register_insert(self, rows: Sequence[int], tid: int) -> None:
        with self._lock:
            self.tids[list(rows)] = tid
            self._any_uncommitted = True
            self._device_cache = None

    def commit_insert(self, rows: Sequence[int], commit_id: int) -> None:
        with self._lock:
            rows = list(rows)
            self.begin_cids[rows] = commit_id
            self.tids[rows] = 0
            self.max_begin_cid = max(self.max_begin_cid, commit_id)
            self._device_cache = None

    def rollback_insert(self, rows: Sequence[int]) -> None:
        with self._lock:
            rows = list(rows)
            # rows stay invisible forever (begin stays MAX); count as invalid
            self.end_cids[rows] = 0
            self.tids[rows] = 0
            self._invalid_rows += len(rows)
            self._any_end = True
            self._device_cache = None

    def try_lock_rows(self, rows: Sequence[int], tid: int):
        """CAS tid 0 -> tid per row (ref: mvcc_data.hpp:40-41).  Also
        refuses rows already deleted by a committed transaction
        (first-committer-wins: our snapshot saw the old version, but a
        newer commit invalidated it).  Returns (success, locked_rows)."""
        with self._lock:
            rows = list(rows)
            current = self.tids[rows]
            conflict = (current != 0) & (current != tid)
            already_deleted = self.end_cids[rows] != MAX_COMMIT_ID
            if conflict.any() or already_deleted.any():
                return False, []
            self.tids[rows] = tid
            self._device_cache = None
            return True, rows

    def unlock_rows(self, rows: Sequence[int]) -> None:
        with self._lock:
            self.tids[list(rows)] = 0
            self._device_cache = None

    def commit_delete(self, rows: Sequence[int], commit_id: int) -> None:
        with self._lock:
            rows = list(rows)
            self.end_cids[rows] = commit_id
            self.tids[rows] = 0
            self._invalid_rows += len(rows)
            self._any_end = True
            self._device_cache = None

    def invalid_row_count(self) -> int:
        return self._invalid_rows

    # -------------------------------------------------------------- reads

    def all_visible_shortcut(self, snapshot_cid: int) -> bool:
        """True when every row is plainly visible at this snapshot (no
        deletes, no pending/over-snapshot inserts) — Validate becomes a
        no-op (ref: validate.cpp:56-67 whole-chunk shortcut)."""
        with self._lock:
            return (
                not self._any_end
                and not self._any_uncommitted
                and self.max_begin_cid <= snapshot_cid
            )

    def device_arrays(self):
        with self._lock:
            if self._device_cache is None:
                self._device_cache = (
                    jnp.asarray(self.begin_cids),
                    jnp.asarray(self.end_cids),
                    jnp.asarray(self.tids),
                )
            return self._device_cache

    def snapshot_uncommitted_flags(self) -> None:
        # recompute _any_uncommitted after commits (cheap scan)
        with self._lock:
            self._any_uncommitted = bool((self.tids != 0).any())

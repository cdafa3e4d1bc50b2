"""Per-table MVCC version data (ref: storage/mvcc_data.hpp:15-60 —
begin/end commit-id vectors + transaction-id vector with CAS locking,
max_begin_cid whole-chunk visibility shortcut, invalid-row counting).

Host numpy arrays are the source of truth; a cached device copy serves
the vectorized Validate kernel.  Writes queue their few touched rows and
the next reader replays the queue onto the device copy in one donated
scatter — invalidating the cache re-uploaded the full begin/end/tid
vectors per DML statement (~2.4 MB on a 100k-row table), and eager
per-write scatters cost five dispatches per OLTP transaction.
"""

from __future__ import annotations

import threading
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

MAX_COMMIT_ID = np.int64(2**62)


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _jit_apply_writes(b, e, t, idx3, val3):
    """Replay queued host writes onto the device mirror in ONE dispatch
    (donated: updates in place; padding rows carry an out-of-range index
    and drop).  The three fields' writes arrive STACKED as (3, bucket)
    arrays — one upload for indices, one for values, instead of six 0-d/
    1-d uploads per replay (~15 device_puts per TPC-C transaction came
    from here).  Only under runtime.exclusive_access()."""
    return (
        b.at[idx3[0]].set(val3[0], mode="drop"),
        e.at[idx3[1]].set(val3[1], mode="drop"),
        t.at[idx3[2]].set(val3[2], mode="drop"),
    )


@jax.jit
def _jit_apply_writes_copy(b, e, t, idx3, val3):
    """Non-donating variant for concurrent execution."""
    return (
        b.at[idx3[0]].set(val3[0], mode="drop"),
        e.at[idx3[1]].set(val3[1], mode="drop"),
        t.at[idx3[2]].set(val3[2], mode="drop"),
    )


def _pad_writes3(pending, oob: int):
    """The three fields' (rows, value) queues -> stacked (3, bucket)
    index/value arrays, deduplicated last-wins on the host first (XLA
    scatter-set order is undefined at duplicate indices).  One shared
    bucket keeps the pair of uploads to exactly two."""
    mergeds = []
    n_max = 0
    for field in ("begin", "end", "tids"):
        merged = {}
        for rows, v in pending[field]:
            for r in rows:
                merged[r] = v
        mergeds.append(merged)
        n_max = max(n_max, len(merged))
    bucket = 16
    while bucket < n_max:
        bucket *= 2
    idx3 = np.full((3, bucket), oob, dtype=np.int64)
    val3 = np.zeros((3, bucket), dtype=np.int64)
    for k, merged in enumerate(mergeds):
        if merged:
            idx3[k, : len(merged)] = list(merged.keys())
            val3[k, : len(merged)] = list(merged.values())
    return jnp.asarray(idx3), jnp.asarray(val3)


class MvccData:
    def __init__(self, capacity: int, num_rows: int, initial_cid: int = 0):
        self.begin_cids = np.full(capacity, MAX_COMMIT_ID, dtype=np.int64)
        self.end_cids = np.full(capacity, MAX_COMMIT_ID, dtype=np.int64)
        self.tids = np.zeros(capacity, dtype=np.int64)
        # rows loaded before MVCC tracking began are visible from cid 0
        self.begin_cids[:num_rows] = initial_cid
        self._lock = threading.Lock()
        self._device_cache = None
        # host writes queued against the device mirror: three ordered
        # lists of (rows, value), replayed lazily by device_arrays()
        self._pending = {"begin": [], "end": [], "tids": []}
        self._pending_rows = 0
        self.max_begin_cid = initial_cid  # all committed below this are visible
        self._any_end = False
        self._any_uncommitted = False
        self._locked_count = 0  # rows with tid != 0 (kept incrementally)
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
            self._drop_pending()

    # ------------------------------------------------------------- writes

    def register_insert(self, rows: Sequence[int], tid: int) -> None:
        with self._lock:
            rows = list(rows)
            self._set_tids(rows, tid)
            self._mirror(rows, tids=tid)

    def commit_insert(self, rows: Sequence[int], commit_id: int) -> None:
        with self._lock:
            rows = list(rows)
            self.begin_cids[rows] = commit_id
            self._set_tids(rows, 0)
            self.max_begin_cid = max(self.max_begin_cid, commit_id)
            self._mirror(rows, begin=commit_id, tids=0)

    def rollback_insert(self, rows: Sequence[int]) -> None:
        with self._lock:
            rows = list(rows)
            # rows stay invisible forever (begin stays MAX); count as invalid
            self.end_cids[rows] = 0
            self._set_tids(rows, 0)
            self._invalid_rows += len(rows)
            self._any_end = True
            self._mirror(rows, end=0, tids=0)

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
            self._set_tids(rows, tid)
            self._mirror(rows, tids=tid)
            return True, rows

    def unlock_rows(self, rows: Sequence[int]) -> None:
        with self._lock:
            rows = list(rows)
            self._set_tids(rows, 0)
            self._mirror(rows, tids=0)

    def commit_delete(self, rows: Sequence[int], commit_id: int) -> None:
        with self._lock:
            rows = list(rows)
            self.end_cids[rows] = commit_id
            self._set_tids(rows, 0)
            self._invalid_rows += len(rows)
            self._any_end = True
            self._mirror(rows, end=commit_id, tids=0)

    _PENDING_LIMIT = 4096  # past this a full re-upload is cheaper

    def _mirror(self, rows: Sequence[int], *, begin=None, end=None,
                tids=None) -> None:
        """Queue the host write for the device mirror; must run under
        self._lock.  Nothing touches the device until a reader actually
        needs the arrays (device_arrays) — write-only statement bursts
        cost zero device dispatches."""
        if self._device_cache is None or not rows:
            return
        if self._pending_rows + len(rows) > self._PENDING_LIMIT:
            self._device_cache = None
            self._drop_pending()
            return
        if begin is not None:
            self._pending["begin"].append((rows, begin))
        if end is not None:
            self._pending["end"].append((rows, end))
        if tids is not None:
            self._pending["tids"].append((rows, tids))
        self._pending_rows += len(rows)

    def _drop_pending(self) -> None:
        self._pending = {"begin": [], "end": [], "tids": []}
        self._pending_rows = 0

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
                self._drop_pending()
                self._device_cache = (
                    jnp.asarray(self.begin_cids),
                    jnp.asarray(self.end_cids),
                    jnp.asarray(self.tids),
                )
            elif self._pending_rows:
                from hyrise_tpu.utils.runtime import exclusive_access

                oob = len(self.begin_cids)
                b, e, t = self._device_cache
                idx3, val3 = _pad_writes3(self._pending, oob)
                apply_ = (_jit_apply_writes if exclusive_access()
                          else _jit_apply_writes_copy)
                self._device_cache = apply_(b, e, t, idx3, val3)
                self._drop_pending()
            return self._device_cache

    def _set_tids(self, rows, value) -> None:
        """Assign tids keeping the locked-row count incremental (a full
        rescan per commit cost ~0.4 ms per table per OLTP statement).
        Must run under self._lock."""
        before = int((self.tids[rows] != 0).sum())
        self.tids[rows] = value
        after = len(rows) if value != 0 else 0
        self._locked_count += after - before
        self._any_uncommitted = self._locked_count > 0

    def snapshot_uncommitted_flags(self) -> None:
        # full recount (only needed after direct tids[] array surgery,
        # e.g. the GC plugin rebuilding MvccData)
        with self._lock:
            self._locked_count = int((self.tids != 0).sum())
            self._any_uncommitted = self._locked_count > 0

"""MVCC transaction management (ref: concurrency/transaction_manager.hpp:51,
transaction_context.hpp:46-60, commit_context.hpp:18).

Snapshot isolation with write-write conflict detection:
- Each transaction gets a TransactionID and a snapshot CommitID.
- Row versions carry begin_cid / end_cid / tid (see concurrency/mvcc.py);
  visibility: snapshot_cid < end_cid and ((snapshot_cid >= begin_cid) !=
  (row_tid == our_tid))  (ref: validate.cpp:45-53).
- Write-write conflicts: CAS on the row tid; losers roll back
  (RolledBackAfterConflict).
- Commit IDs become visible strictly in order via a chain of CommitContexts.
"""

from __future__ import annotations

import enum
import threading
from typing import Callable, Dict, List, Optional

INITIAL_COMMIT_ID = 1
MAX_COMMIT_ID = 2**62


class TransactionPhase(enum.Enum):
    ACTIVE = "active"
    CONFLICTED = "conflicted"
    COMMITTING = "committing"
    COMMITTED = "committed"
    ROLLED_BACK_BY_USER = "rolled_back_by_user"
    ROLLED_BACK_AFTER_CONFLICT = "rolled_back_after_conflict"


class AutoCommit(enum.Enum):
    YES = True
    NO = False


class CommitContext:
    """Node in the ordered commit chain (ref: commit_context.hpp:18)."""

    def __init__(self, commit_id: int):
        self.commit_id = commit_id
        self.pending = True
        self.callbacks: List[Callable[[int], None]] = []
        self.next: Optional["CommitContext"] = None


class TransactionContext:
    """Ref: transaction_context.hpp:46-60."""

    def __init__(self, manager: "TransactionManager", transaction_id: int,
                 snapshot_commit_id: int, is_auto_commit: bool):
        self._manager = manager
        self.transaction_id = transaction_id
        self.snapshot_commit_id = snapshot_commit_id
        self.is_auto_commit = is_auto_commit
        self.phase = TransactionPhase.ACTIVE
        self.commit_id: Optional[int] = None
        self._rw_operators: List = []  # AbstractReadWriteOperator instances
        self._lock = threading.Lock()

    def register_read_write_operator(self, op) -> None:
        self._rw_operators.append(op)

    @property
    def read_write_operators(self) -> List:
        return self._rw_operators

    def mark_as_conflicted(self) -> None:
        self.phase = TransactionPhase.CONFLICTED

    @property
    def aborted(self) -> bool:
        return self.phase in (
            TransactionPhase.CONFLICTED,
            TransactionPhase.ROLLED_BACK_BY_USER,
            TransactionPhase.ROLLED_BACK_AFTER_CONFLICT,
        )

    def commit(self) -> None:
        if self.phase == TransactionPhase.CONFLICTED:
            raise RuntimeError("cannot commit a conflicted transaction; roll back")
        assert self.phase == TransactionPhase.ACTIVE, self.phase
        self.phase = TransactionPhase.COMMITTING
        ctx = self._manager._new_commit_context()
        self.commit_id = ctx.commit_id
        try:
            for op in self._rw_operators:
                op.commit_records(ctx.commit_id)
        finally:
            # the CommitContext is already enqueued in the ordered chain —
            # it MUST be marked complete even if an operator's commit
            # raised, or the pending head wedges commit visibility for
            # every later transaction in the process
            self._manager._commit(ctx)
        self.phase = TransactionPhase.COMMITTED
        self._manager._deregister(self)

    def rollback(self, after_conflict: bool = False) -> None:
        if self.phase not in (TransactionPhase.ACTIVE,
                              TransactionPhase.CONFLICTED):
            return  # already rolled back/committed: re-running
            # rollback_records would release OTHER transactions' row locks
        for op in self._rw_operators:
            op.rollback_records()
        self.phase = (
            TransactionPhase.ROLLED_BACK_AFTER_CONFLICT
            if after_conflict
            else TransactionPhase.ROLLED_BACK_BY_USER
        )
        self._manager._deregister(self)


class TransactionManager:
    """Ref: transaction_manager.hpp:51-104."""

    def __init__(self):
        self._next_transaction_id = 1
        self._last_commit_id = INITIAL_COMMIT_ID - 1
        self._highest_assigned_cid = self._last_commit_id
        self._lock = threading.Lock()
        self._active_snapshots: Dict[int, int] = {}  # txn id -> snapshot cid
        self._commit_chain_head: Optional[CommitContext] = None
        self._commit_chain_tail: Optional[CommitContext] = None

    @property
    def last_commit_id(self) -> int:
        return self._last_commit_id

    def new_transaction_context(self, is_auto_commit: bool = False) -> TransactionContext:
        from hyrise_tpu.utils.runtime import transaction_begin

        # transactions hold row numbers until commit/rollback: entry
        # blocks while an exclusive section (MVCC GC compaction) is
        # waiting or running, and the section drains open transactions
        transaction_begin()
        with self._lock:
            tid = self._next_transaction_id
            self._next_transaction_id += 1
            ctx = TransactionContext(self, tid, self._last_commit_id, is_auto_commit)
            self._active_snapshots[tid] = ctx.snapshot_commit_id
            return ctx

    def lowest_active_snapshot_commit_id(self) -> Optional[int]:
        """Used by the MVCC GC plugin (ref: transaction_manager.hpp:74)."""
        with self._lock:
            if not self._active_snapshots:
                return None
            return min(self._active_snapshots.values())

    # ------------------------------------------------------------- internals

    def _deregister(self, ctx: TransactionContext) -> None:
        from hyrise_tpu.utils.runtime import transaction_end

        with self._lock:
            self._active_snapshots.pop(ctx.transaction_id, None)
        if not getattr(ctx, "_runtime_released", False):
            ctx._runtime_released = True
            transaction_end()

    def _new_commit_context(self) -> CommitContext:
        with self._lock:
            self._highest_assigned_cid += 1
            ctx = CommitContext(self._highest_assigned_cid)
            if self._commit_chain_tail is None:
                self._commit_chain_head = self._commit_chain_tail = ctx
            else:
                self._commit_chain_tail.next = ctx
                self._commit_chain_tail = ctx
            return ctx

    def _commit(self, ctx: CommitContext) -> None:
        """Make commit ids visible strictly in order (ref:
        transaction_manager.hpp:84 _try_increment_last_commit_id)."""
        with self._lock:
            ctx.pending = False
            while (
                self._commit_chain_head is not None
                and not self._commit_chain_head.pending
            ):
                head = self._commit_chain_head
                self._last_commit_id = head.commit_id
                for cb in head.callbacks:
                    cb(head.commit_id)
                self._commit_chain_head = head.next
                if self._commit_chain_head is None:
                    self._commit_chain_tail = None

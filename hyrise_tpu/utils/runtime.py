"""Process-wide execution bookkeeping.

Two primitives guard the engine's in-place mutation fast paths against
concurrent statements:

`exclusive_access()` — may this statement DONATE (invalidate) the device
buffers it replaces?  Donating deletes the old array, which is only safe
while nothing else can still read it.  Two hazards rule out any
point-in-time "am I alone?" check: a statement entering right after the
check reads the buffer being donated (observed as "Buffer has been
deleted or donated" under a multi-client TPC-C mix), and RESULT tables
alias stored column buffers (late materialization) which clients consume
(`to_pylist`) AFTER their statement scope exits.  Donation is therefore
allowed only in single-session processes: the first time a SECOND thread
ever executes a statement it is disabled for the life of the process
(sticky).  Within one session the standing contract holds: a statement's
result is consumed before the session's next write statement runs
(console, server and the benchmark drivers all do).

`exclusive_section()` — structural table surgery (the MVCC GC physically
compacts tables, shifting row numbers and swapping MvccData) must not
overlap ANY in-flight statement: a reader pairing pre-compaction data
with post-compaction version vectors sees arbitrary wrong rows.  The
section waits for in-flight statements to drain and blocks new ones
while it runs.  Completed results stay safe — compaction builds new
arrays and never mutates the old ones.
"""

from __future__ import annotations

import threading

_cond = threading.Condition()
_local = threading.local()
_first_thread: int | None = None
_multi_session = False
_active = 0            # outermost statements in flight
_single_active = 0     # of those, started in single-session mode (may donate)
_active_txns = 0       # open transaction contexts (may hold row numbers)
_excl_owner: int | None = None  # thread holding the exclusive section
_excl_waiting = 0


class statement_scope:
    """Context manager marking one in-flight statement.  Reentrant per
    thread (EXECUTE re-enters the pipeline for its stored statement).

    The first statement from a SECOND thread flips the process to
    multi-session mode and then waits for any in-flight single-session
    statement to finish — that statement may be donating right now, and
    its replacement buffers only become safely readable once it exits."""

    def __enter__(self):
        global _first_thread, _multi_session, _single_active, _active
        depth = getattr(_local, "depth", 0)
        _local.depth = depth + 1
        if depth == 0:
            me = threading.get_ident()
            with _cond:
                if _first_thread is None:
                    _first_thread = me
                elif not _multi_session and _first_thread != me:
                    _multi_session = True
                    _cond.notify_all()
                # exclusive sections (and the multi-session transition)
                # bar entry — EXCEPT for threads inside an open
                # transaction: the section waits for those transactions
                # to finish, and their remaining statements/commit must
                # proceed or the drain deadlocks
                in_txn = getattr(_local, "txn_depth", 0) > 0
                while (
                    (_excl_owner is not None and _excl_owner != me
                     and not in_txn)
                    or (_excl_waiting > 0 and not in_txn)
                    or (_multi_session and _single_active > 0)
                ):
                    _cond.wait()
                _active += 1
                if not _multi_session:
                    _single_active += 1
                    _local.counted = True
        return self

    def __exit__(self, *exc):
        global _single_active, _active
        _local.depth -= 1
        if _local.depth == 0:
            with _cond:
                _active -= 1
                if getattr(_local, "counted", False):
                    _local.counted = False
                    _single_active -= 1
                _cond.notify_all()
        return False


class ExclusiveTimeout(RuntimeError):
    pass


class exclusive_section:
    """Drain in-flight statements and open transactions, run alone,
    release.  Used by the MVCC GC's physical compaction.  Not reentrant;
    must not be entered while holding a statement scope or an open
    transaction on the same thread (deadlock).

    `timeout` bounds the drain: a leaked transaction context would
    otherwise wedge the section AND (because waiting sections bar new
    transactions) the whole engine.  On timeout the section raises
    ExclusiveTimeout without acquiring anything."""

    def __init__(self, timeout: float = 10.0):
        self.timeout = timeout

    def __enter__(self):
        global _excl_owner, _excl_waiting
        import time as _time

        me = threading.get_ident()
        assert getattr(_local, "depth", 0) == 0, (
            "exclusive_section inside a statement scope would deadlock"
        )
        assert getattr(_local, "txn_depth", 0) == 0, (
            "exclusive_section inside an open transaction would deadlock"
        )
        deadline = _time.monotonic() + self.timeout
        with _cond:
            _excl_waiting += 1
            try:
                while (_excl_owner is not None or _active > 0
                       or _active_txns > 0):
                    remaining = deadline - _time.monotonic()
                    if remaining <= 0:
                        raise ExclusiveTimeout(
                            f"could not drain statements/transactions in "
                            f"{self.timeout}s"
                        )
                    _cond.wait(remaining)
                _excl_owner = me
            finally:
                _excl_waiting -= 1
                _cond.notify_all()  # release entry gate on timeout
        return self

    def __exit__(self, *exc):
        global _excl_owner
        with _cond:
            _excl_owner = None
            _cond.notify_all()
        return False


def transaction_begin() -> None:
    """Count an opening transaction context.  Transactions hold ROW
    NUMBERS (locked/inserted row lists applied at commit), which the
    exclusive section's table compaction would shift — so the section
    drains open transactions, and opening a NEW one blocks while a
    section is waiting or running.  Auto-commit contexts created inside
    an in-flight statement pass (the section cannot be running then)."""
    global _active_txns
    with _cond:
        if getattr(_local, "depth", 0) == 0 and \
                getattr(_local, "txn_depth", 0) == 0:
            while _excl_owner is not None or _excl_waiting > 0:
                _cond.wait()
        _active_txns += 1
        _local.txn_depth = getattr(_local, "txn_depth", 0) + 1


def transaction_end() -> None:
    global _active_txns
    with _cond:
        _active_txns -= 1
        _local.txn_depth = getattr(_local, "txn_depth", 1) - 1
        _cond.notify_all()


def exclusive_access() -> bool:
    """True when this process has only ever run statements from a single
    thread (donation-safe)."""
    return not _multi_session


def _reset_for_tests() -> None:
    global _first_thread, _multi_session, _single_active, _active
    global _excl_owner, _excl_waiting, _active_txns
    with _cond:
        _first_thread = None
        _multi_session = False
        _single_active = 0
        _active = 0
        _active_txns = 0
        _excl_owner = None
        _excl_waiting = 0

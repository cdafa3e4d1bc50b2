"""Process-wide execution bookkeeping.

`exclusive_access()` answers "is this the only statement in flight?" —
the gate for buffer-donation fast paths.  Donating a device buffer
(in-place append, MVCC mirror replay) deletes the old array; that is
only safe while no concurrent statement can still hold a reference to
it.  Single-session OLTP (the common case, and every benchmark) keeps
the fast path; multi-threaded stress keeps the immutable-copy semantics.
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_active = 0
_local = threading.local()


class statement_scope:
    """Context manager marking one in-flight statement.  Reentrant per
    thread (EXECUTE re-enters the pipeline for its stored statement):
    only the outermost scope counts the thread as active."""

    def __enter__(self):
        global _active
        depth = getattr(_local, "depth", 0)
        _local.depth = depth + 1
        if depth == 0:
            with _lock:
                _active += 1
        return self

    def __exit__(self, *exc):
        global _active
        _local.depth -= 1
        if _local.depth == 0:
            with _lock:
                _active -= 1
        return False


def exclusive_access() -> bool:
    """True when at most one statement is executing right now (donation-
    safe: no concurrent reader can hold a stale buffer reference)."""
    with _lock:
        return _active <= 1

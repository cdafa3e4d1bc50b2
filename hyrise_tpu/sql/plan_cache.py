"""GDFS (greedy-dual frequency-size) plan cache keyed by SQL string.

Ref: cache/gdfs_cache.hpp:20 and sql/sql_plan_cache.hpp — priority =
inflation + frequency / size; evict the lowest-priority entry; the evicted
priority inflates future entries so frequently-hit old entries age out.
"""

from __future__ import annotations

import heapq
import itertools
import threading
from typing import Any, Dict, Generic, Hashable, Optional, Tuple, TypeVar

V = TypeVar("V")


class GDFSCache(Generic[V]):
    def __init__(self, capacity: int = 1024):
        self.capacity = capacity
        self._lock = threading.RLock()
        self._entries: Dict[Hashable, Tuple[V, float, int, float]] = {}
        # key -> (value, priority, frequency, size)
        self._inflation = 0.0
        self._counter = itertools.count()

    def set(self, key: Hashable, value: V, size: float = 1.0) -> None:
        with self._lock:
            if key in self._entries:
                _, _, freq, _ = self._entries[key]
                freq += 1
            else:
                freq = 1
            if len(self._entries) >= self.capacity and key not in self._entries:
                self._evict()
            priority = self._inflation + freq / size
            self._entries[key] = (value, priority, freq, size)

    def try_get(self, key: Hashable) -> Optional[V]:
        with self._lock:
            entry = self._entries.get(key)
            if entry is None:
                return None
            value, _, freq, size = entry
            freq += 1
            self._entries[key] = (value, self._inflation + freq / size, freq, size)
            return value

    def has(self, key: Hashable) -> bool:
        with self._lock:
            return key in self._entries

    def _evict(self) -> None:
        if not self._entries:
            return
        victim = min(self._entries, key=lambda k: self._entries[k][1])
        self._inflation = self._entries[victim][1]
        del self._entries[victim]

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
            self._inflation = 0.0

    def __len__(self) -> int:
        with self._lock:
            return len(self._entries)

    def keys(self):
        with self._lock:
            return list(self._entries.keys())

    def values(self):
        with self._lock:
            return [v for (v, _, _, _) in self._entries.values()]

    def items(self):
        with self._lock:
            return [(k, v) for k, (v, _, _, _) in self._entries.items()]

"""In-memory structured log ring (ref: utils/log_manager.hpp:11-30)."""

from __future__ import annotations

import enum
import threading
import time
from dataclasses import dataclass
from typing import List


class LogLevel(enum.Enum):
    DEBUG = "debug"
    INFO = "info"
    WARNING = "warning"


@dataclass
class LogEntry:
    timestamp: float
    log_level: LogLevel
    reporter: str
    message: str


class LogManager:
    def __init__(self, max_entries: int = 100_000):
        self._entries: List[LogEntry] = []
        self._lock = threading.Lock()
        self._max_entries = max_entries

    def add_message(self, reporter: str, message: str, level: LogLevel = LogLevel.INFO):
        with self._lock:
            self._entries.append(LogEntry(time.time(), level, reporter, message))
            if len(self._entries) > self._max_entries:
                self._entries = self._entries[-self._max_entries :]

    def log_entries(self) -> List[LogEntry]:
        with self._lock:
            return list(self._entries)

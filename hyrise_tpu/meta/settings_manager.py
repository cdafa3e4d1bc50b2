"""Runtime settings registry (ref: utils/settings_manager.hpp:19 +
utils/settings/abstract_setting.hpp) — settings surfaced through the
meta_settings table and mutable via SQL UPDATE on it."""

from __future__ import annotations

import threading
from typing import Callable, Dict, List, Optional


class Setting:
    def __init__(
        self,
        name: str,
        value: str,
        description: str = "",
        on_change: Optional[Callable[[str], None]] = None,
    ):
        self.name = name
        self._value = value
        self.description = description
        self._on_change = on_change

    def get(self) -> str:
        return self._value

    def set(self, value: str) -> None:
        self._value = value
        if self._on_change:
            self._on_change(value)


class SettingsManager:
    def __init__(self):
        self._settings: Dict[str, Setting] = {}
        self._lock = threading.RLock()

    def register(self, setting: Setting) -> None:
        with self._lock:
            if setting.name in self._settings:
                raise ValueError(f"setting {setting.name!r} already registered")
            self._settings[setting.name] = setting

    def unregister(self, name: str) -> None:
        with self._lock:
            del self._settings[name]

    def has_setting(self, name: str) -> bool:
        return name in self._settings

    def get_setting(self, name: str) -> Setting:
        return self._settings[name]

    def setting_names(self) -> List[str]:
        return sorted(self._settings)

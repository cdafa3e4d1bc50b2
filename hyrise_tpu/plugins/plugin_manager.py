"""Runtime-loadable plugins (ref: utils/plugin_manager.cpp:60-76 dlopen +
`factory` symbol; utils/abstract_plugin.hpp).

TPU-native equivalent: plugins are Python modules (file path or module name)
exposing a module-level `factory()` returning an AbstractPlugin.  Plugins may
export user-callable functions (surfaced via the meta_exec table) and
benchmark hooks, mirroring the reference surface.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import threading
from typing import Callable, Dict, List


class AbstractPlugin:
    def description(self) -> str:
        raise NotImplementedError

    def start(self) -> None:
        raise NotImplementedError

    def stop(self) -> None:
        raise NotImplementedError

    def executable_functions(self) -> Dict[str, Callable[[], None]]:
        """User-callable functions (ref: abstract_plugin.hpp
        provided_user_executable_functions)."""
        return {}

    def pre_benchmark_hook(self, benchmark_items) -> None:
        pass

    def post_benchmark_hook(self, report) -> None:
        pass


class PluginManager:
    def __init__(self, db):
        self._db = db
        self._plugins: Dict[str, AbstractPlugin] = {}
        self._lock = threading.RLock()

    def load_plugin(self, path_or_module: str) -> None:
        with self._lock:
            name = self._plugin_name(path_or_module)
            if name in self._plugins:
                raise ValueError(f"plugin {name!r} already loaded")
            module = self._import(path_or_module)
            if not hasattr(module, "factory"):
                raise ValueError(
                    f"plugin module {path_or_module!r} has no factory() symbol"
                )
            plugin = module.factory()
            plugin.start()
            self._plugins[name] = plugin
            self._db.log_manager.add_message(
                "PluginManager", f"Plugin {name!r} loaded"
            )

    def unload_plugin(self, name: str) -> None:
        with self._lock:
            if name not in self._plugins:
                raise KeyError(f"plugin {name!r} not loaded")
            self._plugins[name].stop()
            del self._plugins[name]
            self._db.log_manager.add_message(
                "PluginManager", f"Plugin {name!r} unloaded"
            )

    def loaded_plugins(self) -> List[str]:
        return sorted(self._plugins)

    def plugin(self, name: str) -> AbstractPlugin:
        return self._plugins[name]

    def user_executable_functions(self) -> Dict[tuple, Callable[[], None]]:
        out = {}
        for pname, plugin in self._plugins.items():
            for fname, fn in plugin.executable_functions().items():
                out[(pname, fname)] = fn
        return out

    def exec_user_function(self, plugin_name: str, function_name: str) -> None:
        self.user_executable_functions()[(plugin_name, function_name)]()

    def _plugin_name(self, path_or_module: str) -> str:
        base = path_or_module.rsplit("/", 1)[-1]
        base = base[:-3] if base.endswith(".py") else base
        return base.rsplit(".", 1)[-1]  # module path -> leaf name

    def _import(self, path_or_module: str):
        if path_or_module.endswith(".py"):
            name = self._plugin_name(path_or_module)
            spec = importlib.util.spec_from_file_location(name, path_or_module)
            module = importlib.util.module_from_spec(spec)
            sys.modules[name] = module
            spec.loader.exec_module(module)
            return module
        return importlib.import_module(path_or_module)

    def shutdown(self) -> None:
        with self._lock:
            for name in list(self._plugins):
                self.unload_plugin(name)

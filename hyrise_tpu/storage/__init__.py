from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.storage.storage_manager import StorageManager

__all__ = ["Column", "Table", "StorageManager"]

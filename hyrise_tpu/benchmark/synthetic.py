"""Synthetic table generator (ref: benchmarklib/synthetic_table_generator.*
— column-wise value distributions for micro benchmarks)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType


@dataclass
class ColumnSpec:
    name: str
    data_type: DataType = DataType.INT
    distribution: str = "uniform"  # uniform | normal | sorted | skewed(zipf)
    min_value: float = 0.0
    max_value: float = 10_000.0
    distinct: Optional[int] = None  # cap distinct values
    null_fraction: float = 0.0
    zipf_a: float = 1.3


class SyntheticTableGenerator:
    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)

    def generate(self, num_rows: int, specs: List[ColumnSpec]) -> Table:
        data: Dict[str, np.ndarray] = {}
        types: Dict[str, DataType] = {}
        rng = self.rng
        for spec in specs:
            if spec.distribution == "uniform":
                vals = rng.uniform(spec.min_value, spec.max_value, num_rows)
            elif spec.distribution == "normal":
                mid = (spec.min_value + spec.max_value) / 2
                spread = (spec.max_value - spec.min_value) / 6 or 1.0
                vals = np.clip(rng.normal(mid, spread, num_rows),
                               spec.min_value, spec.max_value)
            elif spec.distribution == "sorted":
                vals = np.sort(rng.uniform(spec.min_value, spec.max_value,
                                           num_rows))
            elif spec.distribution == "skewed":
                ranks = rng.zipf(spec.zipf_a, num_rows).astype(np.float64)
                span = spec.max_value - spec.min_value
                vals = spec.min_value + np.minimum(ranks, 10_000) / 10_000 * span
            else:
                raise ValueError(spec.distribution)
            if spec.distinct:
                step = max((spec.max_value - spec.min_value) / spec.distinct, 1e-9)
                vals = spec.min_value + np.floor(
                    (vals - spec.min_value) / step
                ) * step
            if spec.data_type in (DataType.INT, DataType.LONG):
                arr = vals.astype(np.int64)
            elif spec.data_type == DataType.STRING:
                arr = np.array([f"v{int(v)}" for v in vals], dtype=object)
            else:
                arr = vals
            data[spec.name] = arr
            types[spec.name] = spec.data_type
        t = Table.from_numpy(data, types)
        if any(s.null_fraction > 0 for s in specs):
            # rebuild columns with nulls via from_dict (nullable path)
            lists = t.to_dict()
            for spec in specs:
                if spec.null_fraction > 0:
                    mask = rng.random(num_rows) < spec.null_fraction
                    col = lists[spec.name]
                    lists[spec.name] = [
                        None if m else v for v, m in zip(col, mask)
                    ]
            t = Table.from_dict(lists, types)
        return t

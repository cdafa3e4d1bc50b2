"""Per-table / per-column statistics (ref: statistics/table_statistics.hpp,
attribute_statistics.hpp, statistics_objects/ — EqualDistinctCountHistogram
is the build-time default, plus MinMaxFilter, NullValueRatioStatistics,
DistinctValueCount).

Built lazily from device columns (one host transfer per column, sampled
above a size threshold) and cached on the Table; invalidated by DML.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType

SAMPLE_THRESHOLD = 2_000_000
SAMPLE_SIZE = 200_000
HISTOGRAM_BINS = 32


@dataclass
class Histogram:
    """Equal-height histogram over the numeric key domain (ref:
    equal_distinct_count_histogram.hpp — ours is equal-height on a sorted
    sample with per-bin distinct counts)."""

    edges: np.ndarray        # bin edges, len = bins+1
    counts: np.ndarray       # rows per bin (scaled to full table)
    distincts: np.ndarray    # distinct values per bin

    def estimate_range(self, lo: float, hi: float) -> float:
        """Estimated rows with value in [lo, hi]."""
        total = 0.0
        for i in range(len(self.counts)):
            b_lo, b_hi = float(self.edges[i]), float(self.edges[i + 1])
            if b_hi < lo or b_lo > hi:
                continue
            width = max(b_hi - b_lo, 1e-12)
            overlap = max(0.0, min(hi, b_hi) - max(lo, b_lo))
            frac = 1.0 if width <= 0 else min(1.0, overlap / width)
            # at least the boundary value if the range touches the bin
            frac = max(frac, 1.0 / max(self.distincts[i], 1.0))
            total += self.counts[i] * frac
        return total


@dataclass
class ColumnStatistics:
    data_type: DataType
    row_count: int
    distinct_count: float
    null_fraction: float
    min_value: Optional[float]  # normalized numeric (string = code rank)
    max_value: Optional[float]
    histogram: Optional[Histogram] = None


class TableStatistics:
    def __init__(self, columns: Dict[str, ColumnStatistics], row_count: int):
        self.columns = columns
        self.row_count = row_count


def get_table_statistics(table: Table) -> TableStatistics:
    if table.statistics is not None:
        return table.statistics
    stats = {}
    n = table.num_rows
    for name, col in zip(table.column_names, table.columns):
        stats[name] = _column_statistics(col, n)
    table.statistics = TableStatistics(stats, n)
    return table.statistics


def _column_statistics(col: Column, n: int) -> ColumnStatistics:
    if n == 0:
        return ColumnStatistics(col.data_type, 0, 0.0, 0.0, None, None)
    data = col.host_raw(n)
    valid = (
        np.asarray(col.validity)[:n] if col.validity is not None
        else None
    )
    # exact min/max/null_fraction over the FULL column even when the
    # histogram samples: dense-join/dense-group fast paths treat these as
    # hard bounds, and sample extrema would silently drop out-of-range keys
    full_valid_data = data[valid] if valid is not None else data
    null_fraction = (
        1.0 - float(valid.mean()) if valid is not None else 0.0
    )
    if len(full_valid_data) == 0:
        return ColumnStatistics(col.data_type, n, 0.0, null_fraction, None, None)
    exact_min = float(full_valid_data.min())
    exact_max = float(full_valid_data.max())
    scale = 1.0
    if n > SAMPLE_THRESHOLD:
        idx = np.random.default_rng(0).integers(0, n, size=SAMPLE_SIZE)
        data = data[idx]
        if valid is not None:
            valid = valid[idx]
        scale = n / SAMPLE_SIZE
    if valid is not None:
        data = data[valid]
    if len(data) == 0:
        data = full_valid_data[:1]
    vals = data.astype(np.float64)
    sorted_vals = np.sort(vals)
    boundaries = np.concatenate([[True], sorted_vals[1:] != sorted_vals[:-1]])
    d_sample = int(boundaries.sum())
    if scale > 1.0:
        s = len(data)
        # scale-up heuristic: near-unique samples extrapolate to n; heavily
        # repeated values plateau (ref: the reference builds exact
        # distinct counts at load; sampling trades accuracy for load time)
        if d_sample > 0.8 * s:
            distinct = d_sample * scale
        else:
            distinct = min(d_sample * (1 + np.log(scale)), float(n))
    else:
        distinct = float(d_sample)
    histogram = _build_histogram(sorted_vals, boundaries, scale)
    return ColumnStatistics(
        col.data_type,
        n,
        max(distinct, 1.0),
        null_fraction,
        exact_min,
        exact_max,
        histogram,
    )


def _build_histogram(sorted_vals: np.ndarray, boundaries: np.ndarray,
                     scale: float) -> Histogram:
    s = len(sorted_vals)
    bins = min(HISTOGRAM_BINS, s)
    edges_idx = np.linspace(0, s - 1, bins + 1).astype(np.int64)
    edges = sorted_vals[edges_idx]
    counts = np.zeros(bins)
    distincts = np.zeros(bins)
    cum_distinct = np.cumsum(boundaries)
    for i in range(bins):
        a, b = edges_idx[i], edges_idx[i + 1]
        counts[i] = (b - a + (1 if i == bins - 1 else 0)) * scale
        distincts[i] = max(cum_distinct[b] - (cum_distinct[a - 1] if a > 0 else 0), 1)
    return Histogram(edges.astype(np.float64), counts, distincts)

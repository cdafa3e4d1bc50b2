"""Per-block pruning statistics + block skipping.

Ref: statistics/generate_pruning_statistics.cpp:117 builds per-chunk
min/max statistics consumed by ChunkPruningRule and GetTable
(get_table.hpp:57).  TPU redesign: the padded 1-D column splits into
fixed BLOCK_ROWS slices; per (column, block) min/max live on the HOST
(tiny numpy arrays), and GetTable re-packs only the surviving blocks with
one device gather — a selective range scan then never reads the pruned
region of HBM.

Pruning decisions happen host-side from literals, so prepared-statement
parameters (traced scalars) never trigger them — plans stay reusable.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hyrise_tpu.expression import ast
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, PredicateCondition

DEFAULT_BLOCK_ROWS = int(os.environ.get("HYRISE_TPU_BLOCK_ROWS", 1 << 16))

_RANGE_CONDS = (
    PredicateCondition.EQUALS, PredicateCondition.LESS_THAN,
    PredicateCondition.LESS_THAN_EQUALS, PredicateCondition.GREATER_THAN,
    PredicateCondition.GREATER_THAN_EQUALS,
    PredicateCondition.BETWEEN_INCLUSIVE,
    PredicateCondition.BETWEEN_LOWER_EXCLUSIVE,
    PredicateCondition.BETWEEN_UPPER_EXCLUSIVE,
    PredicateCondition.BETWEEN_EXCLUSIVE,
)


@dataclass
class BlockStatistics:
    """Host-side per-block min/max for every numeric/date/string column."""

    block_rows: int
    n_blocks: int
    row_count: int
    # column name -> (mins, maxs, all_null) float64/host arrays
    columns: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]]
    block_counts: np.ndarray  # real rows per block


def build_pruning_statistics(table: Table,
                             block_rows: Optional[int] = None,
                             column_names: Optional[Sequence[str]] = None,
                             ) -> BlockStatistics:
    """Per-block statistics for `column_names` (default: every prunable
    column).  Columns build LAZILY — `ensure_column` adds more later — so
    GetTable only ever pulls the PREDICATE columns to the host."""
    if block_rows is None:
        block_rows = DEFAULT_BLOCK_ROWS  # module attr: tests shrink it
    n = table.num_rows
    nb = max(-(-n // block_rows), 1)
    counts = np.minimum(
        np.maximum(n - np.arange(nb) * block_rows, 0), block_rows
    )
    stats = BlockStatistics(block_rows, nb, n, {}, counts)
    for name in (column_names if column_names is not None
                 else table.column_names):
        ensure_column(stats, table, name)
    return stats


def ensure_column(stats: BlockStatistics, table: Table, name: str) -> bool:
    """Add one column's block min/max to `stats` (one host pull)."""
    if name in stats.columns:
        return True
    try:
        col = table.column(name)
    except KeyError:
        return False
    if col.data_type not in (DataType.INT, DataType.LONG, DataType.DATE,
                             DataType.FLOAT, DataType.DOUBLE,
                             DataType.STRING):
        return False
    n = stats.row_count
    block_rows = stats.block_rows
    nb = stats.n_blocks
    data = col.host_raw(n)
    # int64 values above 2^53 round when cast to float64 — widen integer
    # bounds by one ulp outward so pruning stays SOUND (a block is only
    # skipped when provably disjoint; slightly-wide bounds lose at most a
    # sliver of pruning opportunity, never a matching row)
    is_int = data.dtype.kind in ("i", "u")
    valid = (np.asarray(col.validity)[:n] if col.validity is not None
             else np.ones(n, dtype=bool))
    mins = np.full(nb, np.inf)
    maxs = np.full(nb, -np.inf)
    all_null = np.zeros(nb, dtype=bool)
    for b in range(nb):
        sl = slice(b * block_rows, min((b + 1) * block_rows, n))
        v = valid[sl]
        if not v.any():
            all_null[b] = True
            continue
        d = data[sl][v]
        lo, hi = float(d.min()), float(d.max())
        if is_int:
            lo = np.nextafter(lo, -np.inf)
            hi = np.nextafter(hi, np.inf)
        mins[b] = lo
        maxs[b] = hi
    stats.columns[name] = (mins, maxs, all_null)
    return True


def _literal_to_float(col_dtype: DataType, dictionary, value) -> Optional[float]:
    """Encode a predicate literal into the column's comparable domain
    (dictionary RANK for strings — the sorted dictionary makes code order
    value order, so block min/max over codes support range pruning)."""
    if value is None:
        return None
    if col_dtype == DataType.STRING:
        if dictionary is None:
            return None
        rank = float(np.searchsorted(dictionary, str(value)))
        if rank < len(dictionary) and dictionary[int(rank)] == str(value):
            return rank
        return rank - 0.5  # between ranks: exact misses handled by compare
    if col_dtype == DataType.DATE and isinstance(value, str):
        from hyrise_tpu.utils.dates import single_date_to_days

        return float(single_date_to_days(value))
    if isinstance(value, (int, float)):
        return float(value)
    return None


def blocks_surviving(stats: BlockStatistics, table: Table,
                     predicates: Sequence[ast.Predicate]) -> np.ndarray:
    """Boolean keep-mask over blocks for a conjunction of simple
    column-vs-literal comparisons (a block survives unless some predicate
    PROVABLY rejects every row in it)."""
    keep = np.ones(stats.n_blocks, dtype=bool)
    for p in predicates:
        if not isinstance(p, ast.Predicate) or p.condition not in _RANGE_CONDS:
            continue
        col_e = p.children[0]
        if not isinstance(col_e, ast.ColumnRef):
            continue
        entry = stats.columns.get(col_e.display_name)
        if entry is None:
            continue
        try:
            col = table.column(col_e.display_name)
        except KeyError:
            continue
        lits = [c.value if isinstance(c, ast.Literal) else None
                for c in p.children[1:]]
        if any(v is None for v in lits):
            continue
        vals = [_literal_to_float(col.data_type, col.dictionary, v)
                for v in lits]
        if any(v is None for v in vals):
            continue
        mins, maxs, all_null = entry
        c = p.condition
        v = vals[0]
        if c == PredicateCondition.EQUALS:
            ok = (mins <= v) & (v <= maxs)
        elif c == PredicateCondition.LESS_THAN:
            ok = mins < v
        elif c == PredicateCondition.LESS_THAN_EQUALS:
            ok = mins <= v
        elif c == PredicateCondition.GREATER_THAN:
            ok = maxs > v
        elif c == PredicateCondition.GREATER_THAN_EQUALS:
            ok = maxs >= v
        else:  # BETWEEN variants
            v2 = vals[1]
            lo_ok = (maxs > v) if c in (
                PredicateCondition.BETWEEN_LOWER_EXCLUSIVE,
                PredicateCondition.BETWEEN_EXCLUSIVE) else (maxs >= v)
            hi_ok = (mins < v2) if c in (
                PredicateCondition.BETWEEN_UPPER_EXCLUSIVE,
                PredicateCondition.BETWEEN_EXCLUSIVE) else (mins <= v2)
            ok = lo_ok & hi_ok
        keep &= ok & ~all_null
    return keep


def _prunable_operand(c: ast.Expression) -> bool:
    """Literal, or an uncorrelated scalar subquery whose value GetTable
    resolves at runtime (ref: get_table.hpp:57-58 — chunks dynamically
    pruned from uncorrelated-subquery results)."""
    if isinstance(c, ast.Literal):
        return True
    return (isinstance(c, ast.Subquery) and not c.is_correlated()
            and len(c.lqp.output_expressions()) == 1)


def collect_pruning_predicates(node) -> List[ast.Predicate]:
    """Simple comparisons usable for block pruning from a predicate
    expression (conjunctions recursed; OR branches ignored).  Operands
    may be literals (static pruning) or uncorrelated scalar subqueries
    (dynamic pruning, resolved per execution by GetTable)."""
    out: List[ast.Predicate] = []

    def rec(e):
        if isinstance(e, ast.Logical) and e.op == "and":
            rec(e.children[0])
            rec(e.children[1])
            return
        if (isinstance(e, ast.Predicate)
                and e.condition in _RANGE_CONDS
                and isinstance(e.children[0], ast.ColumnRef)
                and all(_prunable_operand(c) for c in e.children[1:])):
            out.append(e)

    rec(node)
    return out

"""In-memory table: named columns over padded device arrays.

TPU-native redesign of ref storage/table.hpp:40 + chunk.hpp:38.  Rather than
a vector of chunks with polymorphic segments, a Table is a struct of padded
1-D device arrays (one per column) plus a logical row count; "chunks" exist
only as per-block pruning statistics (see statistics/pruning.py) and as the
sharding unit across devices (parallel/).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from hyrise_tpu.storage.column import Column
from hyrise_tpu.types import (
    ColumnDefinition,
    DataType,
    padded_size,
)


@dataclass
class TableKeyConstraint:
    """Soft PK/unique constraint (ref: storage/constraints/
    table_key_constraint.hpp; NOT ENFORCED, table.hpp:215-218)."""

    columns: tuple
    is_primary_key: bool = False


@dataclass
class ForeignKeyConstraint:
    """Soft FK (ref: storage/constraints/foreign_key_constraint.hpp)."""

    columns: tuple
    referenced_table: str
    referenced_columns: tuple


@dataclass
class TableOrderConstraint:
    """Soft order dependency (ref: storage/constraints/table_order_constraint.hpp)."""

    ordering_columns: tuple
    ordered_columns: tuple


class Table:
    """Columnar table (ref: table.hpp:40)."""

    def __init__(
        self,
        column_names: Sequence[str],
        columns: Sequence[Column],
        num_rows: int,
        selection: Optional[object] = None,
    ):
        assert len(column_names) == len(columns)
        self.column_names: List[str] = list(column_names)
        self.columns: List[Column] = list(columns)
        # num_rows is an UPPER BOUND when `selection` is set: the table's
        # real rows are those with index < num_rows AND selection True.
        # Deferred selection is the TPU analogue of the reference's
        # ReferenceSegment pos lists (late materialization) — filters stay
        # as device masks with no host sync until a shape decision needs
        # the exact count.
        self.num_rows = num_rows
        self.selection = selection
        self._valid_count: Optional[int] = None
        self._materialized: Optional["Table"] = None
        # Soft constraints consumed by the optimizer (data dependencies).
        self.key_constraints: List[TableKeyConstraint] = []
        self.foreign_key_constraints: List[ForeignKeyConstraint] = []
        self.order_constraints: List[TableOrderConstraint] = []
        # (column_name, SortMode) metadata when known sorted (ref:
        # chunk.hpp:156 individually_sorted_by).
        self.sorted_by: List[tuple] = []
        # Lazily built statistics (statistics/table_statistics.py attaches).
        self.statistics = None
        self.pruning_statistics = None
        # MVCC sidecar (concurrency/mvcc.py attaches for DML tables).
        self.mvcc = None
        # per-column access counters (ref: segment_access_counter.hpp:20-37
        # Point/Sequential/... counters; ours counts scan touches, surfaced
        # via meta_segments)
        self.access_counters = {}

    # ----------------------------------------------------------------- schema

    @property
    def num_columns(self) -> int:
        return len(self.columns)

    @property
    def capacity(self) -> int:
        return self.columns[0].capacity if self.columns else 0

    def column_id(self, name: str) -> int:
        try:
            return self.column_names.index(name)
        except ValueError:
            raise KeyError(f"no column named {name!r}; have {self.column_names}")

    def column(self, name: str) -> Column:
        return self.columns[self.column_id(name)]

    def column_definitions(self) -> List[ColumnDefinition]:
        return [
            ColumnDefinition(n, c.data_type, c.validity is not None)
            for n, c in zip(self.column_names, self.columns)
        ]

    def reserve(self, capacity: int) -> None:
        """Grow padded capacity without changing num_rows, so upcoming
        inserts fit without a reshape (a capacity change re-keys every
        compiled stage on the table — the analogue of the reference
        pre-allocating mutable chunks, chunk.hpp:52).  No-op when the
        current capacity suffices; unsupported on encoded columns
        (encoded tables are immutable, like the reference's encoded
        chunks)."""
        import jax.numpy as jnp

        new_cap = padded_size(capacity)
        if new_cap <= self.capacity or any(c.is_encoded for c in self.columns):
            return
        if self.mvcc is not None:
            self.mvcc.grow(new_cap)
        for c in self.columns:
            data = jnp.zeros(new_cap, dtype=c.data.dtype)
            c.data = data.at[: c.data.shape[0]].set(c.data)
            if c.validity is not None:
                valid = jnp.zeros(new_cap, dtype=bool)
                c.validity = valid.at[: c.validity.shape[0]].set(c.validity)

    # ------------------------------------------------------------------ build

    @staticmethod
    def from_dict(
        data: Dict[str, Sequence[Any]],
        types: Optional[Dict[str, DataType]] = None,
    ) -> "Table":
        """Build from {name: python values}; types inferred if not given."""
        names = list(data.keys())
        n = len(next(iter(data.values()))) if data else 0
        cap = padded_size(n)
        cols = []
        for name in names:
            values = list(data[name])
            dt = (types or {}).get(name) or _infer_type(values)
            cols.append(Column.from_values(values, dt, capacity=cap))
        return Table(names, cols, n)

    @staticmethod
    def from_numpy(
        data: Dict[str, np.ndarray],
        types: Dict[str, DataType],
        num_rows: Optional[int] = None,
        encode: bool = False,
        validity: Optional[Dict[str, np.ndarray]] = None,
        capacity: Optional[int] = None,
    ) -> "Table":
        """`encode=True` packs eligible columns host-side BEFORE upload
        (bulk-load path; post-upload encoding would round-trip every
        column through the device tunnel).  `validity` maps column name ->
        bool array (True = non-NULL) for columns with NULLs.  `capacity`
        reserves padded headroom beyond num_rows so OLTP inserts don't
        reshape (and recompile) early in a run — the analogue of the
        reference pre-allocating a mutable chunk (chunk.hpp:52)."""
        names = list(data.keys())
        n = num_rows if num_rows is not None else len(next(iter(data.values())))
        cap = max(padded_size(n), padded_size(capacity) if capacity else 0)
        validity = validity or {}
        cols = [
            Column.from_numpy(np.asarray(data[name]), types[name],
                              validity=validity.get(name),
                              capacity=cap, encode=encode)
            for name in names
        ]
        t = Table(names, cols, n)
        from hyrise_tpu.storage.column import bulk_encode_active

        if encode or bulk_encode_active():
            t.encode_attempted = True  # add_table(encode=True) skips re-pull
        return t

    @staticmethod
    def empty(definitions: Sequence[ColumnDefinition]) -> "Table":
        cols = [Column.from_values([], d.data_type) for d in definitions]
        return Table([d.name for d in definitions], cols, 0)

    # ------------------------------------------------------------------- ops

    def take(self, indices, n: int, null_where_negative: bool = False) -> "Table":
        """Row gather: new table of the first n gathered rows.  Callers
        must only gather real rows (materialize first when a selection is
        pending).

        Raw same-dtype payloads stack into one matrix and gather as ROWS:
        a random access that pulls k*itemsize bytes amortizes the per-
        access latency that dominates TPU gathers — measured 5.2x over
        per-column takes for 8 f32 columns at 4M rows (ROOFLINE_TPU.json
        gather_rows_f32x8 vs gather_f32)."""
        from collections import defaultdict
        from dataclasses import replace as _replace

        from hyrise_tpu.kernels import gather as gatherk

        safe = jnp.maximum(indices, 0)
        ok = (indices >= 0) if null_where_negative else None
        # small sources (dimension tables) reroute to the one-hot select
        # kernel: dense VPU compute instead of latency-bound HBM access
        onehot = gatherk.use_onehot(self.capacity, int(indices.shape[0]))
        groups = defaultdict(list)  # physical dtype -> [(array, tag)]
        for i, c in enumerate(self.columns):
            if c.is_encoded:
                continue
            groups[str(c.data.dtype)].append((c.data, ("d", i)))
            if c.validity is not None:
                groups["bool"].append((c.validity, ("v", i)))
        res_data: dict = {}
        res_valid: dict = {}

        def _set(tag, arr):
            (kind, i) = tag
            (res_data if kind == "d" else res_valid)[i] = arr

        for items in groups.values():
            if len(items) == 1:
                arr, tag = items[0]
                _set(tag, gatherk.onehot_take(arr, safe) if onehot
                     else jnp.take(arr, safe, axis=0))
            else:
                mat = jnp.stack([a for a, _ in items], axis=1)
                gm = (gatherk.onehot_take(mat, safe) if onehot
                      else jnp.take(mat, safe, axis=0))
                for j, (_, tag) in enumerate(items):
                    _set(tag, gm[:, j])
        out_cols = []
        for i, c in enumerate(self.columns):
            if c.is_encoded:
                out_cols.append(c.take(indices, null_where_negative))
                continue
            validity = res_valid.get(i)
            if null_where_negative:
                validity = ok if validity is None else (validity & ok)
            out_cols.append(_replace(c, data=res_data[i], validity=validity))
        return Table(self.column_names, out_cols, n)

    def row_mask(self):
        """Mask of real (non-padding, selected) rows over capacity."""
        mask = jnp.arange(self.capacity) < self.num_rows
        if self.selection is not None:
            mask = mask & self.selection
        return mask

    @property
    def valid_count(self) -> int:
        """Exact row count (host sync when a selection is pending)."""
        if self.selection is None:
            return self.num_rows
        if self._valid_count is None:
            from hyrise_tpu.kernels import masks as maskk

            self._valid_count = int(
                maskk.count_selected(self.selection, self.num_rows)
            )
        return self._valid_count

    def materialize(self) -> "Table":
        """Compact pending selections into a dense table (one host sync).
        Cached: operator outputs are immutable, and several consumers of
        the same output (e.g. Update -> Delete + Insert) each compact."""
        if self.selection is None:
            return self
        if self._materialized is not None:
            return self._materialized
        from hyrise_tpu.kernels import masks as maskk
        from hyrise_tpu.types import size_bucket

        if not any(c.is_encoded for c in self.columns):
            # whole-table gather in one dispatch (OLTP statements paid
            # ~2 eager dispatches per column here)
            from dataclasses import replace as _replace

            datas = tuple(c.data for c in self.columns)
            valids = tuple(c.validity for c in self.columns)
            nr = jnp.asarray(self.num_rows, dtype=jnp.int32)
            if self._valid_count is None:
                # speculate a point-statement-sized output and learn the
                # count from the compaction's own sync: the separate
                # count round trip dominated OLTP point selects.  A miss
                # costs one 128-row gather before the correctly-sized one.
                spec = min(128, self.capacity)
                cnt, out_d, out_v = maskk.compact_columns_counted(
                    datas, valids, self.selection, nr, spec
                )
                self._valid_count = n = int(cnt)
                cap = min(size_bucket(n), self.capacity)
                if n > spec:
                    out_d, out_v = maskk.compact_columns(
                        datas, valids, self.selection, nr, cap
                    )
                else:
                    cap = spec
            else:
                n = self.valid_count
                cap = min(size_bucket(n), self.capacity)
                out_d, out_v = maskk.compact_columns(
                    datas, valids, self.selection, nr, cap
                )
            cols = [
                _replace(c, data=d, validity=v)
                for c, d, v in zip(self.columns, out_d, out_v)
            ]
            out = Table(self.column_names, cols, n)
        else:
            n = self.valid_count
            cap = min(size_bucket(n), self.capacity)
            idx = maskk.mask_to_indices(self.row_mask(), cap)
            out = self.take(idx, n)
        out.sorted_by = self.sorted_by
        out.mvcc = None
        self._materialized = out
        return out

    def encode_packed(self) -> int:
        """FOR/bit-pack eligible columns in place (the ChunkEncoder analogue;
        ref: storage/chunk_encoder.hpp:28-67 — encoding runs after chunks
        fill).  Only safe on dense tables (no pending selection); mutation
        paths decode first (reference: encoded chunks are immutable).
        Returns the number of columns packed."""
        if self.selection is not None or getattr(self, "encode_attempted",
                                                 False):
            return sum(1 for c in self.columns if c.is_encoded)
        self.columns = [c.encode_packed(self.num_rows) for c in self.columns]
        self.encode_attempted = True
        return sum(1 for c in self.columns if c.is_encoded)

    def decoded(self) -> "Table":
        """Copy with every encoded (packed/RLE) column decoded; self when
        none are.  Entry point for EAGER device paths that read column
        payloads directly (window, set ops, cross/nested-loop joins) —
        jitted stages instead decode inside the trace
        (operators/compiled._rebuild)."""
        if not any(c.is_encoded for c in self.columns):
            return self
        t = Table(self.column_names, [c.decoded() for c in self.columns],
                  self.num_rows, self.selection)
        t.sorted_by = self.sorted_by
        return t

    def decode_packed(self) -> None:
        """Decode any encoded columns in place (pre-mutation hook)."""
        if any(c.is_encoded for c in self.columns):
            self.columns = [c.decoded() for c in self.columns]

    def rename(self, names: Sequence[str]) -> "Table":
        t = Table(list(names), self.columns, self.num_rows, self.selection)
        t.sorted_by = self.sorted_by
        return t

    def select(self, names: Sequence[str]) -> "Table":
        for n in names:
            self.access_counters[n] = self.access_counters.get(n, 0) + 1
        t = Table(
            list(names), [self.column(n) for n in names], self.num_rows,
            self.selection,
        )
        # keep the longest sorted prefix whose columns survive
        for cn, m in self.sorted_by:
            if cn not in names:
                break
            t.sorted_by.append((cn, m))
        return t

    # ------------------------------------------------------------------ host

    def to_pylist(self) -> List[tuple]:
        """All rows as python tuples (None for NULL) — test oracle surface
        (ref: utils/check_table_equal.cpp)."""
        t = self.materialize()
        cols = [c.to_pylist(t.num_rows) for c in t.columns]
        return [tuple(col[i] for col in cols) for i in range(t.num_rows)]

    def to_dict(self) -> Dict[str, list]:
        t = self.materialize()
        return {
            n: c.to_pylist(t.num_rows)
            for n, c in zip(t.column_names, t.columns)
        }

    def __repr__(self) -> str:
        types = ",".join(
            f"{n}:{c.data_type.value}" for n, c in zip(self.column_names, self.columns)
        )
        return f"Table[{self.num_rows} rows]({types})"


def _infer_type(values: Iterable[Any]) -> DataType:
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            return DataType.INT
        if isinstance(v, int):
            return DataType.LONG if abs(v) > 2**31 - 1 else DataType.INT
        if isinstance(v, float):
            return DataType.DOUBLE
        if isinstance(v, str):
            return DataType.STRING
    return DataType.INT

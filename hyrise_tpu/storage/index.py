"""Secondary indexes (ref: storage/index/ — AdaptiveRadixTreeIndex,
GroupKeyIndex, CompositeGroupKeyIndex per chunk; PartialHashIndex across
chunks, partial_hash_index.hpp:19).

TPU-native redesign: pointer-chasing trees don't map to the hardware, so
the ordered index is a device-resident sorted projection (sorted keys +
row permutation — the GroupKey idea applied whole-column); lookups are
binary searches that return row-id ranges.  The hash index is a host-side
exact-match dictionary for point lookups (the TPC-C path) — the analogue
of PartialHashIndex for the host control plane.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from hyrise_tpu.kernels import joins as joink
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType


@partial(jax.jit, static_argnames=("capacity",))
def _jit_range_mask(sorted_keys, perm, n_valid, lo, hi, base_mask,
                    capacity: int):
    """One fused dispatch per index probe: binary searches + scatter +
    base-mask AND (eager per-op dispatches each cross the TPU tunnel)."""
    left = jnp.minimum(jnp.searchsorted(sorted_keys, lo, side="left"),
                       n_valid)
    right = jnp.minimum(jnp.searchsorted(sorted_keys, hi, side="right"),
                        n_valid)
    pos = jnp.arange(perm.shape[0])
    in_range = (pos >= left) & (pos < right)
    mask = jnp.zeros(capacity, dtype=bool)
    rows = jnp.clip(perm, 0, capacity - 1)
    out = mask.at[rows].max(in_range)
    return out & base_mask


class OrderedIndex:
    """Sorted-projection index over one column (ref: group_key_index.hpp:53
    — offsets into a sorted dictionary; generalized to any column)."""

    def __init__(self, table: Table, column_name: str):
        self.column_name = column_name
        col = table.column(column_name)
        n = table.num_rows
        keys = joink.normalize_key(col.decoded().data)
        valid = table.row_mask()
        if col.validity is not None:
            valid = valid & col.validity
        self.sorted_keys, self.perm, self.n_valid = joink.build_sorted(keys, valid)
        self._row_count_at_build = n

    def range_for(self, lo_key, hi_key) -> Tuple[jax.Array, jax.Array]:
        """Positions [left, right) of rows with lo_key <= key <= hi_key in
        the sorted projection; map through `perm` for row ids."""
        # bounds outside the key dtype cannot match anything — tighten past
        # the domain edge instead of clamping ONTO it (clamping turned
        # `= 2^31` on int32 into false matches of INT32_MAX)
        dt = self.sorted_keys.dtype
        if jnp.issubdtype(dt, jnp.integer):
            info = jnp.iinfo(dt)
            if lo_key > info.max or hi_key < info.min or lo_key > hi_key:
                zero = jnp.zeros((), jnp.int32)
                return zero, zero
            lo_key = int(max(lo_key, info.min))
            hi_key = int(min(hi_key, info.max))
        left = jnp.minimum(
            jnp.searchsorted(self.sorted_keys, lo_key, side="left"), self.n_valid
        )
        right = jnp.minimum(
            jnp.searchsorted(self.sorted_keys, hi_key, side="right"), self.n_valid
        )
        return left, right

    def row_mask_for_range(self, lo_key, hi_key, capacity: int,
                           base_mask: Optional[jax.Array] = None) -> jax.Array:
        if base_mask is None:
            base_mask = jnp.ones(capacity, dtype=bool)
        dt = self.sorted_keys.dtype
        if jnp.issubdtype(dt, jnp.integer):
            info = jnp.iinfo(dt)
            if lo_key > info.max or hi_key < info.min or lo_key > hi_key:
                return jnp.zeros(capacity, dtype=bool)
            lo_key = int(max(lo_key, info.min))
            hi_key = int(min(hi_key, info.max))
        return _jit_range_mask(
            self.sorted_keys, self.perm, jnp.asarray(self.n_valid),
            jnp.asarray(lo_key, dt), jnp.asarray(hi_key, dt), base_mask,
            capacity,
        )

    @property
    def stale(self) -> bool:
        return False  # rebuilt on DML via Table.invalidate_indexes


class CompositeOrderedIndex:
    """Multi-column sorted projection (ref: composite_group_key_index.hpp:43
    — concatenated dictionary codes searched lexicographically).  Each
    column's key is offset to zero and bit-shifted into one int64, so the
    packed order IS the lexicographic column order and lookups stay one
    binary search.  Requires the cumulative key width to fit 63 bits —
    always true for dictionary codes, dates and TPC-style ids."""

    def __init__(self, table: Table, column_names: Sequence[str]):
        self.column_names = tuple(column_names)
        n = table.num_rows
        valid = table.row_mask()
        offsets: List[int] = []
        widths: List[int] = []
        cols = []
        for name in column_names:
            col = table.column(name)
            data = col.host_raw()
            if data.dtype.kind not in ("i", "u"):
                raise ValueError(
                    f"composite index needs integer-keyed columns, "
                    f"{name} is {data.dtype}"
                )
            live = data[:n]
            lo = int(live.min()) if n else 0
            hi = int(live.max()) if n else 0
            offsets.append(lo)
            widths.append(max((hi - lo).bit_length(), 1))
            cols.append(data)
            if col.validity is not None:
                valid = valid & col.validity
        if sum(widths) > 63:
            raise ValueError("composite key exceeds 63 bits")
        self.offsets = offsets
        self.widths = widths
        packed = np.zeros(cols[0].shape[0], dtype=np.int64)
        shift = 0
        for data, lo, w in zip(reversed(cols), reversed(offsets),
                               reversed(widths)):
            field = np.clip(data.astype(np.int64) - lo, 0,
                            (1 << w) - 1)
            packed |= field << shift
            shift += w
        self.sorted_keys, self.perm, self.n_valid = joink.build_sorted(
            jnp.asarray(packed), valid
        )
        self._row_count_at_build = n

    def key_for(self, values: Sequence[int]) -> Optional[int]:
        """Pack one lookup tuple; None when any value falls outside the
        built key domain (no row can match)."""
        packed = 0
        shift = 0
        fields = list(zip(values, self.offsets, self.widths))
        for v, lo, w in reversed(fields):
            f = int(v) - lo
            if f < 0 or f >= (1 << w):
                return None
            packed |= f << shift
            shift += w
        return packed

    def row_mask_for_equals(self, values: Sequence[int], capacity: int,
                            base_mask: Optional[jax.Array] = None) -> jax.Array:
        key = self.key_for(values)
        if key is None:
            return jnp.zeros(capacity, dtype=bool)
        if base_mask is None:
            base_mask = jnp.ones(capacity, dtype=bool)
        dt = self.sorted_keys.dtype
        return _jit_range_mask(
            self.sorted_keys, self.perm, jnp.asarray(self.n_valid),
            jnp.asarray(key, dt), jnp.asarray(key, dt), base_mask, capacity,
        )


class HashIndex:
    """Host-side exact-match index (ref: partial_hash_index.hpp:19) — used
    by the control plane for point lookups (primary-key probes)."""

    def __init__(self, table: Table, column_names: Sequence[str]):
        self.column_names = tuple(column_names)
        n = table.num_rows
        cols = [table.column(c).host_raw(n) for c in column_names]
        # NULL rows never satisfy an equality probe — exclude them from
        # the build (their null-slot payloads are storage garbage)
        valid = np.ones(n, dtype=bool)
        for c in column_names:
            v = table.column(c).validity
            if v is not None:
                valid &= np.asarray(v)[:n]
        self._map: Dict[tuple, List[int]] = {}
        for i in np.flatnonzero(valid):
            key = tuple(int(c[i]) for c in cols)
            self._map.setdefault(key, []).append(int(i))

    def rows_for(self, key: tuple) -> List[int]:
        return self._map.get(tuple(int(k) for k in key), [])

    def __contains__(self, key: tuple) -> bool:
        return tuple(int(k) for k in key) in self._map


class IndexRegistry:
    """Per-table index bookkeeping (ref: Table::create_partial_hash_index,
    table.hpp:209; chunk index lists chunk.hpp)."""

    def __init__(self):
        self._ordered: Dict[Tuple[str, str], OrderedIndex] = {}
        self._hash: Dict[Tuple[str, tuple], HashIndex] = {}
        self._composite: Dict[Tuple[str, tuple], CompositeOrderedIndex] = {}

    def create_ordered_index(self, table_name: str, table: Table,
                             column_name: str) -> OrderedIndex:
        idx = OrderedIndex(table, column_name)
        self._ordered[(table_name, column_name)] = idx
        return idx

    def create_hash_index(self, table_name: str, table: Table,
                          column_names: Sequence[str]) -> HashIndex:
        idx = HashIndex(table, column_names)
        self._hash[(table_name, tuple(column_names))] = idx
        return idx

    def create_composite_index(self, table_name: str, table: Table,
                               column_names: Sequence[str]
                               ) -> CompositeOrderedIndex:
        idx = CompositeOrderedIndex(table, column_names)
        self._composite[(table_name, tuple(column_names))] = idx
        return idx

    def ordered_index(self, table_name: str, column_name: str):
        return self._ordered.get((table_name, column_name))

    def composite_index(self, table_name: str, column_names: Sequence[str]):
        return self._composite.get((table_name, tuple(column_names)))

    def composite_index_for_set(self, table_name: str, names) -> Optional[
            Tuple[tuple, "CompositeOrderedIndex"]]:
        """The widest composite index on `table_name` whose columns are a
        subset of the equality-column SET `names` (order-insensitive —
        every indexed column gets an exact probe value; surplus equalities
        stay as residual filters).  Returns (stored column order, index)
        or None."""
        want = frozenset(names)
        best = None
        for (t, cols), idx in self._composite.items():
            if t == table_name and frozenset(cols) <= want:
                if best is None or len(cols) > len(best[0]):
                    best = (cols, idx)
        return best

    def hash_index(self, table_name: str, column_names: Sequence[str]):
        return self._hash.get((table_name, tuple(column_names)))

    def invalidate(self, table_name: str) -> None:
        self._ordered = {
            k: v for k, v in self._ordered.items() if k[0] != table_name
        }
        self._hash = {k: v for k, v in self._hash.items() if k[0] != table_name}
        self._composite = {
            k: v for k, v in self._composite.items() if k[0] != table_name
        }

    def list_indexes(self) -> List[tuple]:
        return (
            [("ordered", t, (c,)) for (t, c) in self._ordered]
            + [("hash", t, cols) for (t, cols) in self._hash]
            + [("composite", t, cols) for (t, cols) in self._composite]
        )

"""Columnar storage: one device array per column with validity mask.

TPU-native redesign of the reference's segment zoo (ref:
storage/abstract_segment.hpp:13, value_segment.hpp:16,
dictionary_segment.hpp:20).  Instead of per-chunk polymorphic segments we
keep ONE padded device array per column; strings are always
dictionary-encoded (sorted dictionary on the host, int32 codes on device —
the TPU analogue of DictionarySegment, where a sorted dictionary makes
code-order == value-order so range predicates run on codes).
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass, replace
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hyrise_tpu.storage.compression import (
    PackedArray,
    RLEArray,
    decode_numpy,
    decode_rle_numpy,
    encode_numpy,
    encode_rle_numpy,
    take_packed,
    take_rle,
    unpack_device,
    unrle_device,
)
from hyrise_tpu.types import DataType, LANE, padded_size, physical_dtype
from hyrise_tpu.utils.dates import date_str_to_days, days_to_date_str

# Bulk-load scope: while active, Column.from_numpy applies FOR/bit-packing
# HOST-SIDE before the device upload.  Generators wrap their generate()
# in this instead of threading an `encode` flag through every table
# builder; packing after upload would round-trip each column through the
# device tunnel (seconds per column on remote TPU backends).
_BULK_ENCODE_DEPTH = 0


@contextmanager
def bulk_encode():
    global _BULK_ENCODE_DEPTH
    _BULK_ENCODE_DEPTH += 1
    try:
        yield
    finally:
        _BULK_ENCODE_DEPTH -= 1


def bulk_encode_active() -> bool:
    return _BULK_ENCODE_DEPTH > 0


@dataclass
class Column:
    """A full-table column: padded 1-D device array + optional validity.

    `validity` is True for valid (non-NULL) rows; None means "no NULLs".
    Rows at index >= the owning table's num_rows are padding garbage —
    every consumer masks them via the table's row mask.
    """

    data_type: DataType
    data: jax.Array
    validity: Optional[jax.Array] = None
    dictionary: Optional[np.ndarray] = None  # sorted unicode array (STRING)
    dict_sorted: bool = True

    # ------------------------------------------------------------------ build

    @staticmethod
    def from_values(
        values: Sequence[Any],
        data_type: DataType,
        capacity: Optional[int] = None,
    ) -> "Column":
        """Build from host values (list with possible None entries)."""
        n = len(values)
        cap = capacity if capacity is not None else padded_size(n)
        has_null = any(v is None for v in values)
        if data_type == DataType.STRING:
            strs = np.array(["" if v is None else str(v) for v in values], dtype=object)
            dictionary, codes = _encode_dictionary(strs.astype(str) if n else np.array([], dtype=str))
            data = np.zeros(cap, dtype=np.int32)
            data[:n] = codes
            col = Column(data_type, jnp.asarray(data), None, dictionary, True)
        elif data_type == DataType.DATE:
            days = np.zeros(n, dtype=np.int32)
            idx = [i for i, v in enumerate(values) if v is not None]
            if idx:
                days[idx] = date_str_to_days([str(values[i]) for i in idx])
            data = np.zeros(cap, dtype=np.int32)
            data[:n] = days
            col = Column(data_type, jnp.asarray(data))
        else:
            np_dtype = physical_dtype(data_type)
            raw = np.zeros(n, dtype=np_dtype)
            for i, v in enumerate(values):
                if v is not None:
                    raw[i] = v
            data = np.zeros(cap, dtype=np_dtype)
            data[:n] = raw
            col = Column(data_type, jnp.asarray(data))
        if has_null:
            valid = np.ones(cap, dtype=bool)
            for i, v in enumerate(values):
                if v is None:
                    valid[i] = False
            col.validity = jnp.asarray(valid)
        return col

    @staticmethod
    def from_numpy(
        arr: np.ndarray,
        data_type: DataType,
        validity: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
        encode: bool = False,
    ) -> "Column":
        """Build from a numpy array (no None entries; use `validity`).

        `encode=True` applies FOR/bit-packing HOST-SIDE before the device
        upload (bulk-load path) — packing after upload costs a full
        device->host->device round trip per column, which through a remote
        TPU tunnel dominates generation time."""
        n = len(arr)
        cap = capacity if capacity is not None else padded_size(n)
        dictionary = None
        if data_type == DataType.STRING:
            dictionary, codes = _encode_dictionary(np.asarray(arr, dtype=str))
            data = np.zeros(cap, dtype=np.int32)
            data[:n] = codes
        else:
            np_dtype = physical_dtype(data_type)
            values = np.asarray(arr)
            if data_type == DataType.DATE and values.dtype.kind in ("U", "S", "O"):
                values = date_str_to_days(values.astype(str))
            data = np.zeros(cap, dtype=np_dtype)
            data[:n] = values.astype(np_dtype)
        valid = None
        if validity is not None and not validity.all():
            valid = np.ones(cap, dtype=bool)
            valid[:n] = validity
        payload = None
        if encode or bulk_encode_active():
            payload = _choose_encoding(data, valid, n, data_type)
        if payload is None:
            payload = jnp.asarray(data)
        col = Column(data_type, payload, None, dictionary,
                     dictionary is not None)
        if valid is not None:
            col.validity = jnp.asarray(valid)
        return col

    @staticmethod
    def from_device(
        data: jax.Array,
        data_type: DataType,
        validity: Optional[jax.Array] = None,
        dictionary: Optional[np.ndarray] = None,
        dict_sorted: bool = True,
    ) -> "Column":
        return Column(data_type, data, validity, dictionary, dict_sorted)

    # ------------------------------------------------------------ compression

    @property
    def is_packed(self) -> bool:
        return isinstance(self.data, PackedArray)

    @property
    def is_rle(self) -> bool:
        return isinstance(self.data, RLEArray)

    @property
    def is_encoded(self) -> bool:
        return self.is_packed or self.is_rle

    def encode_packed(self, n_rows: int) -> "Column":
        """Compress this column's device payload if profitable (the
        ChunkEncoder analogue; ref: storage/chunk_encoder.hpp — encoding
        applied after a chunk is filled).  Chooses between FOR/bit-packing
        (integer domains) and run-length encoding (sorted/clustered
        columns, incl. floats); already-encoded columns return self."""
        if self.is_encoded:
            return self
        values = np.asarray(self.data)
        valid = np.asarray(self.validity) if self.validity is not None else None
        payload = _choose_encoding(values, valid, n_rows, self.data_type)
        if payload is None or isinstance(payload, jax.Array):
            return self
        return replace(self, data=payload)

    def decoded(self) -> "Column":
        """Raw (decoded) copy of an encoded column; self when already raw."""
        if self.is_packed:
            return replace(self, data=unpack_device(self.data.words, self.data))
        if self.is_rle:
            return replace(self, data=unrle_device(
                self.data.values, self.data.run_ends, self.data))
        return self

    # ------------------------------------------------------------- transforms

    @property
    def capacity(self) -> int:
        if self.is_packed or self.is_rle:
            return self.data.capacity
        return int(self.data.shape[0])

    def take(self, indices: jax.Array, null_where_negative: bool = False) -> "Column":
        """Gather rows by index (the late-materialization primitive; ref:
        ReferenceSegment / pos lists, storage/reference_segment.hpp:20).

        If `null_where_negative`, indices < 0 produce NULL rows (used by
        outer joins for unmatched sides)."""
        from hyrise_tpu.kernels import gather as gatherk

        safe = jnp.maximum(indices, 0)
        onehot = (not self.is_encoded) and gatherk.use_onehot(
            int(self.data.shape[0]), int(indices.shape[0])
        )
        if self.is_packed:
            data = take_packed(self.data, safe)
        elif self.is_rle:
            data = take_rle(self.data, safe)
        elif onehot:
            data = gatherk.onehot_take(self.data, safe)
        else:
            data = jnp.take(self.data, safe, axis=0)
        validity = None
        if self.validity is not None:
            validity = (gatherk.onehot_take(self.validity, safe) if onehot
                        else jnp.take(self.validity, safe, axis=0))
        if null_where_negative:
            ok = indices >= 0
            validity = ok if validity is None else (validity & ok)
        return replace(self, data=data, validity=validity)

    def with_validity(self, validity: Optional[jax.Array]) -> "Column":
        return replace(self, validity=validity)

    def valid_mask(self, n: Optional[int] = None) -> jax.Array:
        """Boolean validity over the full capacity (padding not excluded)."""
        if self.validity is not None:
            return self.validity
        return jnp.ones(self.capacity, dtype=bool)

    # ------------------------------------------------------------------ host

    def host_raw(self, n: Optional[int] = None) -> np.ndarray:
        """Physical values (dict codes / day numbers, NOT decoded) on host;
        unpacks packed columns.  The statistics/index-build accessor."""
        data = _decode_host(self.data)
        return data if n is None else data[:n]

    def to_numpy(self, n: int):
        """Return (values, valid) host arrays for the first n rows; STRING
        columns are decoded through the dictionary.  Conversion happens
        numpy-first so it stays legal on concrete arrays even while an
        outer jit trace is active."""
        data = _decode_host(self.data)[:n]
        valid = (
            np.asarray(self.validity)[:n]
            if self.validity is not None
            else np.ones(n, dtype=bool)
        )
        if self.data_type == DataType.STRING:
            if len(self.dictionary) == 0:
                return np.array([""] * n, dtype=object), valid
            codes = np.clip(data, 0, len(self.dictionary) - 1)
            return self.dictionary[codes].astype(object), valid
        if self.data_type == DataType.DATE:
            return days_to_date_str(data).astype(object), valid
        return data, valid

    def to_pylist(self, n: int) -> list:
        values, valid = self.to_numpy(n)
        return [v.item() if hasattr(v, "item") else v for v in
                (values[i] if valid[i] else None for i in range(n))]


# ----------------------------------------------------------------- dictionary


def _choose_encoding(data: np.ndarray, valid, n: int, data_type: DataType):
    """Pick the smaller profitable device encoding for a host column:
    FOR/bit-packing for integer domains, RLE for sorted/clustered columns
    (the only option for floats).  None when raw wins (the per-column
    SegmentEncodingSpec decision; ref: segment_encoding_utils.*)."""
    packed = None
    if data_type not in (DataType.FLOAT, DataType.DOUBLE):
        packed = encode_numpy(data, valid, n)
    rle = encode_rle_numpy(data, valid, n)
    if packed is not None and rle is not None:
        return packed if packed.nbytes <= rle.nbytes else rle
    return packed if packed is not None else rle


def _decode_host(payload) -> np.ndarray:
    """Host decode of any column payload (raw/packed/RLE)."""
    if isinstance(payload, PackedArray):
        return decode_numpy(payload)
    if isinstance(payload, RLEArray):
        return decode_rle_numpy(payload)
    return np.asarray(payload)


def _encode_dictionary(arr: np.ndarray):
    """Sorted-dictionary encode (ref: dictionary_segment.hpp:20 — sorted
    dictionary => ValueID order is value order)."""
    if arr.size == 0:
        return np.array([], dtype=str), np.array([], dtype=np.int32)
    dictionary, codes = np.unique(arr, return_inverse=True)
    return dictionary, codes.astype(np.int32)


def recode_to_dictionary(
    col: Column, target_dict: np.ndarray, lut: Optional[np.ndarray] = None
) -> jax.Array:
    """Map a STRING column's codes into another dictionary's code space.
    Codes absent from `target_dict` map to -1 (used for joins/comparisons
    across tables with different dictionaries).  `lut` (old code -> new
    code) skips the string binary search when the caller already has it
    (merge_with_luts produces both sides' LUTs in one pass)."""
    col = col.decoded()
    if lut is None:
        src = col.dictionary
        pos = np.searchsorted(target_dict, src)
        pos_clipped = np.clip(pos, 0, max(len(target_dict) - 1, 0))
        found = (
            (pos < len(target_dict))
            & (target_dict[pos_clipped] == src)
            if len(target_dict)
            else np.zeros(len(src), dtype=bool)
        )
        lut = np.where(found, pos_clipped, -1).astype(np.int32)
    if len(lut) == 0:
        return jnp.full(col.data.shape, -1, dtype=jnp.int32)
    # pad the LUT to a power-of-two bucket: dictionary growth would
    # otherwise change this gather's input shape every OLTP insert, and
    # each new shape is a fresh (eager) XLA compile
    n = len(lut)
    bucket = 1 << max(n - 1, 1).bit_length()
    if bucket > n:
        lut = np.concatenate(
            [lut, np.full(bucket - n, -1, dtype=np.int32)]
        )
    return jnp.take(jnp.asarray(lut), jnp.clip(col.data, 0, n - 1), axis=0)


def merge_with_luts(a: np.ndarray, b: np.ndarray):
    """Merge two sorted dictionaries AND both recode LUTs in one string
    pass (np.unique inverse indices) — the append-with-new-values path
    paid three separate string binary searches.  Returns (merged, lut_a,
    lut_b); merged is `a` itself (luts None) when b adds nothing."""
    if not len(b):
        return a, None, None
    if len(a):
        pos = np.searchsorted(a, b)
        pos_c = np.minimum(pos, len(a) - 1)
        if (a[pos_c] == b).all():
            return a, None, pos_c.astype(np.int32)
    merged, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    inv = inv.astype(np.int32)
    return merged, inv[: len(a)], inv[len(a):]


def merge_dictionaries(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not (len(a) or len(b)):
        return a
    # identity-preserving: compiled-stage cache keys use id(dictionary), so
    # appends whose values already exist must NOT mint a new dictionary
    # object (OLTP inserts would re-key — and recompile — every stage
    # touching the table).  `a` is sorted by invariant, so membership is a
    # binary search — np.isin's O(|a| log |a|) sort per insert dominated
    # TPC-C insert latency.
    if len(a):
        pos = np.searchsorted(a, b)
        pos_c = np.minimum(pos, len(a) - 1)
        if (a[pos_c] == b).all():
            return a
    return np.unique(np.concatenate([a, b]))

"""Table file loaders/writers: .tbl (reference header format and TPC
dbgen-style), CSV (+ .json meta sidecar), and a binary .npz snapshot format.

Ref: utils/load_table.cpp (.tbl with a name row and a type row, types like
`int|float_null|string`), import_export/csv/* (meta sidecar), and
import_export/binary/* (full-table dump; ours is numpy-npz based with the
dictionary stored alongside the codes).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, padded_size

_TYPE_NAMES = {
    "int": DataType.INT,
    "long": DataType.LONG,
    "float": DataType.FLOAT,
    "double": DataType.DOUBLE,
    "string": DataType.STRING,
    "date": DataType.DATE,
}
_TYPE_NAMES_REV = {v: k for k, v in _TYPE_NAMES.items()}


def load_table(path: str, types: Optional[Dict[str, DataType]] = None) -> Table:
    if path.endswith(".csv"):
        return load_csv(path)
    if path.endswith(".npz") or path.endswith(".bin"):
        return load_binary(path)
    return load_tbl(path, types)


_NATIVE_TYPE_CHAR = {
    DataType.INT: "i",
    DataType.LONG: "i",
    DataType.FLOAT: "f",
    DataType.DOUBLE: "f",
    DataType.STRING: "s",
    DataType.DATE: "d",
}


def load_dbgen_tbl(path: str, names, types: Dict[str, DataType],
                   separator: str = "|") -> Table:
    """Load a headerless dbgen-style delimited file (trailing separators
    tolerated).  Uses the native C++ parser when available (in-parser
    dictionary encoding) and falls back to Python."""
    from hyrise_tpu.native import parse_file_native
    from hyrise_tpu.storage.column import Column as Col

    type_chars = "".join(_NATIVE_TYPE_CHAR[types[n]] for n in names)
    parsed = parse_file_native(path, type_chars, separator)
    if parsed is not None:
        payloads, n = parsed
        cap = padded_size(n)
        import jax.numpy as jnp

        cols = []
        for name, payload in zip(names, payloads):
            dt = types[name]
            if dt == DataType.STRING:
                codes, dictionary = payload
                data = np.zeros(cap, dtype=np.int32)
                data[:n] = codes
                cols.append(Col(dt, jnp.asarray(data), None, dictionary, True))
            else:
                npdt = {
                    DataType.INT: np.int32, DataType.LONG: np.int64,
                    DataType.FLOAT: np.float32, DataType.DOUBLE: np.float64,
                    DataType.DATE: np.int32,
                }[dt]
                data = np.zeros(cap, dtype=npdt)
                data[:n] = payload.astype(npdt)
                cols.append(Col(dt, jnp.asarray(data)))
        return Table(list(names), cols, n)
    # Python fallback
    rows = []
    with open(path) as fh:
        for ln in fh:
            ln = ln.rstrip("\n")
            if not ln:
                continue
            parts = ln.split(separator)
            rows.append(parts)
    data = {n: [] for n in names}
    for r in rows:
        for j, n in enumerate(names):
            data[n].append(_parse_value(r[j], types[n]))
    return Table.from_dict(data, types)


def load_tbl(path: str, types: Optional[Dict[str, DataType]] = None) -> Table:
    """Hyrise-style .tbl: row 1 = names, row 2 = types (suffix _null =
    nullable); remaining rows pipe-separated values, 'null' = NULL."""
    with open(path) as fh:
        lines = [ln.rstrip("\n") for ln in fh]
    lines = [ln for ln in lines if ln != ""]
    names = [c.strip() for c in lines[0].split("|")]
    type_tokens = [c.strip() for c in lines[1].split("|")]
    col_types: List[DataType] = []
    nullable: List[bool] = []
    for tok in type_tokens:
        is_null = tok.endswith("_null")
        base = tok[:-5] if is_null else tok
        col_types.append(_TYPE_NAMES[base])
        nullable.append(is_null)
    rows = [ln.split("|") for ln in lines[2:]]
    data: Dict[str, list] = {n: [] for n in names}
    for r in rows:
        for j, n in enumerate(names):
            v = r[j]
            if nullable[j] and v.lower() == "null":
                data[n].append(None)
            else:
                data[n].append(_parse_value(v, col_types[j]))
    return Table.from_dict(data, dict(zip(names, col_types)))


def _parse_value(v: str, dt: DataType):
    if dt in (DataType.INT, DataType.LONG):
        return int(v)
    if dt in (DataType.FLOAT, DataType.DOUBLE):
        return float(v)
    return v


def load_csv(path: str) -> Table:
    """CSV with optional Hyrise-style .json meta sidecar
    (ref: import_export/csv/csv_meta.hpp).  With a sidecar schema the
    native RFC-4180 parser handles the file (quotes/escapes/embedded
    newlines, in-parser dictionary encoding, unquoted-empty = NULL);
    without one, Python infers types from the header + body."""
    import csv as _csv

    meta_path = path + ".json"
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
    if meta is not None:
        native = _load_csv_native(path, meta)
        if native is not None:
            return native
    with open(path, newline="") as fh:
        reader = _csv.reader(fh)
        rows = list(reader)
    if meta is not None:
        names = [c["name"] for c in meta["columns"]]
        types = [
            _TYPE_NAMES[c["type"].removesuffix("_null")] for c in meta["columns"]
        ]
        nullable = [c["type"].endswith("_null") or c.get("nullable", False)
                    for c in meta["columns"]]
        body = rows
    else:
        names = rows[0]
        body = rows[1:]
        types = [_infer_csv_type([r[j] for r in body]) for j in range(len(names))]
        nullable = [True] * len(names)
    data: Dict[str, list] = {n: [] for n in names}
    for r in body:
        for j, n in enumerate(names):
            v = r[j] if j < len(r) else ""
            if nullable[j] and v == "":
                data[n].append(None)
            else:
                data[n].append(_parse_value(v, types[j]))
    return Table.from_dict(data, dict(zip(names, types)))


def _load_csv_native(path: str, meta: dict) -> Optional[Table]:
    """Schema-driven CSV load through the native parser; None when the
    native library is unavailable (caller falls back to Python)."""
    from hyrise_tpu.native import parse_file_native
    from hyrise_tpu.storage.column import Column as Col

    names = [c["name"] for c in meta["columns"]]
    types = {
        c["name"]: _TYPE_NAMES[c["type"].removesuffix("_null")]
        for c in meta["columns"]
    }
    config = meta.get("config", {})
    sep = config.get("separator", ",")
    type_chars = "".join(_NATIVE_TYPE_CHAR[types[n]] for n in names)
    parsed = parse_file_native(path, type_chars, sep, csv=True,
                               skip_header=bool(config.get("header", False)))
    if parsed is None:
        return None
    payloads, n = parsed
    cap = padded_size(n)
    import jax.numpy as jnp

    cols = []
    for name, payload in zip(names, payloads):
        dt = types[name]
        valid = None
        if dt == DataType.STRING:
            codes, dictionary = payload[0], payload[1]
            if len(payload) == 3:
                valid = payload[2]
            data = np.zeros(cap, dtype=np.int32)
            data[:n] = codes
            col = Col(dt, jnp.asarray(data), None, dictionary, True)
        else:
            if isinstance(payload, tuple):
                payload, valid = payload
            npdt = {
                DataType.INT: np.int32, DataType.LONG: np.int64,
                DataType.FLOAT: np.float32, DataType.DOUBLE: np.float64,
                DataType.DATE: np.int32,
            }[dt]
            data = np.zeros(cap, dtype=npdt)
            data[:n] = payload.astype(npdt)
            col = Col(dt, jnp.asarray(data))
        if valid is not None:
            v = np.zeros(cap, dtype=bool)
            v[:n] = valid
            col.validity = jnp.asarray(v)
        cols.append(col)
    return Table(list(names), cols, n)


def _infer_csv_type(values: List[str]) -> DataType:
    saw_float = False
    for v in values:
        if v == "":
            continue
        try:
            int(v)
        except ValueError:
            try:
                float(v)
                saw_float = True
            except ValueError:
                return DataType.STRING
    return DataType.DOUBLE if saw_float else DataType.INT


def write_csv(table: Table, path: str, with_meta: bool = True) -> None:
    import csv as _csv

    cols = [c.to_pylist(table.num_rows) for c in table.columns]
    with open(path, "w", newline="") as fh:
        writer = _csv.writer(fh)
        for i in range(table.num_rows):
            writer.writerow([
                "" if cols[j][i] is None else cols[j][i]
                for j in range(table.num_columns)
            ])
    if with_meta:
        meta = {
            "columns": [
                {
                    "name": n,
                    "type": _TYPE_NAMES_REV[c.data_type]
                    + ("_null" if c.validity is not None else ""),
                }
                for n, c in zip(table.column_names, table.columns)
            ]
        }
        with open(path + ".json", "w") as fh:
            json.dump(meta, fh, indent=2)


def save_binary(table: Table, path: str) -> None:
    """Binary table snapshot: codes/values + dictionaries + validity
    (ref: import_export/binary/binary_writer.hpp:20)."""
    payload = {"__names__": np.array(table.column_names, dtype=str),
               "__nrows__": np.array([table.num_rows])}
    for i, (n, c) in enumerate(zip(table.column_names, table.columns)):
        payload[f"data_{i}"] = c.host_raw(table.num_rows)
        payload[f"type_{i}"] = np.array([_TYPE_NAMES_REV[c.data_type]])
        if c.validity is not None:
            payload[f"valid_{i}"] = np.asarray(c.validity[: table.num_rows])
        if c.dictionary is not None:
            payload[f"dict_{i}"] = c.dictionary.astype(str)
    np.savez_compressed(path, **payload)


def load_binary(path: str) -> Table:
    with np.load(path, allow_pickle=False) as z:
        names = [str(x) for x in z["__names__"]]
        n = int(z["__nrows__"][0])
        cap = padded_size(n)
        cols = []
        for i, name in enumerate(names):
            dt = _TYPE_NAMES[str(z[f"type_{i}"][0])]
            raw = z[f"data_{i}"]
            import jax.numpy as jnp

            from hyrise_tpu.storage.column import bulk_encode_active
            from hyrise_tpu.storage.compression import encode_numpy
            from hyrise_tpu.types import DataType

            data = np.zeros(cap, dtype=raw.dtype)
            data[:n] = raw
            valid_np = None
            validity = None
            if f"valid_{i}" in z:
                valid_np = np.ones(cap, dtype=bool)
                valid_np[:n] = z[f"valid_{i}"]
                validity = jnp.asarray(valid_np)
            dictionary = z[f"dict_{i}"] if f"dict_{i}" in z else None
            payload = None
            if bulk_encode_active() and dt not in (DataType.FLOAT,
                                                   DataType.DOUBLE):
                payload = encode_numpy(data, valid_np, n)
            if payload is None:
                payload = jnp.asarray(data)
            cols.append(Column(dt, payload, validity, dictionary, True))
        t = Table(names, cols, n)
        if bulk_encode_active():
            t.encode_attempted = True
        return t

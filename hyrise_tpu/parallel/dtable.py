"""Distributed tables: the sharded counterpart of storage/table.py.

A DTable is the unit of data flowing through the DISTRIBUTED physical
plan (parallel/dexec.py): per-column (n_shards, rows_per_shard) device
arrays laid out over a 1-D mesh, plus a row-validity mask.  Columns are
identified by the SAME Expression objects the logical plan uses (an LQP
column IS the expression that produced it), so the distributed executor
resolves plan expressions against shard blocks exactly like the
single-chip engine resolves them against padded 1-D arrays.

This layer has no reference counterpart (hyrise is single-node); it is
the TPU-native replacement for NUMA data placement (SURVEY §2.17):
tables hash/block-partitioned over devices, with XLA collectives
standing in for shared memory.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from hyrise_tpu.expression import ast
from hyrise_tpu.parallel.mesh import QueryMesh, SHARD_AXIS
from hyrise_tpu.parallel.multihost import host_fetch
from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType, LANE, padded_size


@dataclass
class DColumn:
    """One column of a distributed table: (n_shards, rows_per_shard)."""

    data: jax.Array
    validity: Optional[jax.Array]
    dtype: DataType
    dictionary: Optional[np.ndarray] = None
    dict_sorted: bool = True


@dataclass
class DTable:
    """Row-sharded table keyed by plan expressions."""

    exprs: List[ast.Expression]
    columns: List[DColumn]
    row_valid: jax.Array  # (n_shards, rows_per_shard) bool
    mesh: QueryMesh
    est_rows: Optional[float] = None

    @property
    def n_shards(self) -> int:
        return int(self.row_valid.shape[0])

    @property
    def rows_per_shard(self) -> int:
        return int(self.row_valid.shape[1])

    def cmap(self) -> Dict[tuple, int]:
        return {e.key(): i for i, e in enumerate(self.exprs)}

    def column_for(self, expr: ast.Expression) -> DColumn:
        return self.columns[self.cmap()[expr.key()]]

    def select(self, exprs: Sequence[ast.Expression]) -> "DTable":
        cmap = self.cmap()
        cols = [self.columns[cmap[e.key()]] for e in exprs]
        return replace(self, exprs=list(exprs), columns=cols)


def local_table(dt: DTable, blocks: Sequence[jax.Array],
                valids: Sequence[Optional[jax.Array]],
                row_valid: jax.Array) -> Tuple[Table, Dict[tuple, int]]:
    """Rebuild a shard-local Table view (+ column map) from traced blocks
    inside shard_map; the single-chip ExpressionEvaluator then runs
    unchanged per shard."""
    cols = []
    for dc, data, valid in zip(dt.columns, blocks, valids):
        cols.append(Column(dc.dtype, data, valid, dc.dictionary,
                           dc.dict_sorted))
    names = [f"c{i}" for i in range(len(cols))]
    t = Table(names, cols, row_valid.shape[0], selection=row_valid)
    return t, dt.cmap()


def flatten_dtable(dt: DTable):
    """(datas, valids, row_valid) pytree for feeding a jitted stage."""
    return ([c.data for c in dt.columns],
            [c.validity for c in dt.columns],
            dt.row_valid)


def dtable_signature(dt: DTable) -> tuple:
    """Stage-cache key material (mirrors operators/compiled.table_signature)."""
    return (
        dt.row_valid.shape,
        tuple(
            (c.dtype, str(c.data.dtype), c.validity is not None,
             id(c.dictionary) if c.dictionary is not None else None)
            for c in dt.columns
        ),
        tuple(e.key() for e in dt.exprs),
    )


# ------------------------------------------------------------ partitioning


@dataclass
class ShardedBase:
    """A base table's columns partitioned over the mesh, keyed by column
    NAME (plan expressions bind at StoredTableNode execution time)."""

    column_names: List[str]
    columns: List[DColumn]
    row_valid: jax.Array
    mesh: QueryMesh
    num_rows: int

    def dtable_for(self, exprs: Sequence[ast.Expression]) -> DTable:
        """Bind plan column refs (by display name) to sharded columns."""
        by_name = {n: c for n, c in zip(self.column_names, self.columns)}
        cols = [by_name[e.name()] for e in exprs]
        return DTable(list(exprs), cols, self.row_valid, self.mesh,
                      float(self.num_rows))


def partition_base(table: Table, qmesh: QueryMesh,
                   rows_per_shard: Optional[int] = None) -> ShardedBase:
    """Block-partition a single-chip Table across the mesh."""
    table = table.materialize()
    n = table.num_rows
    ndev = qmesh.n
    if rows_per_shard is None:
        rows_per_shard = padded_size(-(-max(n, 1) // ndev), LANE)
    cap = ndev * rows_per_shard
    # host-side slicing: under multi-process execution each process holds
    # the same full host copy and device_put places only its local shards
    idx = np.arange(cap)
    take_max = max(table.capacity - 1, 0)
    take_idx = np.clip(idx, 0, take_max)
    sharding = qmesh.sharding(P(SHARD_AXIS, None))
    cols: List[DColumn] = []
    for col in table.columns:
        col = col.decoded()  # shards ship raw; per-shard packing is future work
        data = np.asarray(col.data)[take_idx].reshape(ndev, rows_per_shard)
        data = jax.device_put(data, sharding)
        validity = None
        if col.validity is not None:
            validity = np.asarray(col.validity)[take_idx].reshape(
                ndev, rows_per_shard)
            validity = jax.device_put(validity, sharding)
        cols.append(DColumn(data, validity, col.data_type, col.dictionary,
                            col.dict_sorted))
    row_valid = jax.device_put((idx < n).reshape(ndev, rows_per_shard),
                               sharding)
    return ShardedBase(list(table.column_names), cols, row_valid, qmesh, n)


def gather_dtable(dt: DTable) -> Table:
    """Collect a DTable to one host Table (the distributed→single-chip
    boundary; the remainder of the plan continues on the padded-1-D
    engine).  Compaction happens host-side in numpy."""
    valid = host_fetch(dt.row_valid).reshape(-1)
    keep = np.flatnonzero(valid)
    n = int(keep.size)
    cap = padded_size(max(n, 1))
    names = _unique_names(dt.exprs)
    cols: List[Column] = []
    for dc in dt.columns:
        flat = host_fetch(dc.data).reshape(-1)
        data = np.zeros(cap, dtype=flat.dtype)
        data[:n] = flat[keep]
        validity = None
        if dc.validity is not None:
            vflat = host_fetch(dc.validity).reshape(-1)
            v = np.ones(cap, dtype=bool)
            v[:n] = vflat[keep]
            validity = jnp.asarray(v)
        cols.append(Column(dc.dtype, jnp.asarray(data), validity,
                           dc.dictionary, dc.dict_sorted))
    return Table(names, cols, n)


def _unique_names(exprs: Sequence[ast.Expression]) -> List[str]:
    seen: Dict[str, int] = {}
    out = []
    for e in exprs:
        name = e.name()
        if name in seen:
            seen[name] += 1
            name = f"{name}__{seen[name]}"
        else:
            seen[name] = 0
        out.append(name)
    return out


# ------------------------------------------------------------ stage memo

_STAGE_CACHE: Dict[tuple, tuple] = {}


def run_dstage(sig: tuple, build: Callable[[], tuple], args: tuple):
    """Run a compiled distributed stage, memoized by plan/shape key so
    repeated queries (plan-cache hits) reuse the XLA executable.

    `build()` returns (jitted_fn, meta_cell); meta_cell['meta'] is host
    metadata captured during tracing (result dtypes, dictionaries) and is
    cached alongside the executable (mirrors operators/compiled.run_stage).
    Returns (outputs, meta)."""
    hit = _STAGE_CACHE.get(sig)
    if hit is not None:
        fn, meta = hit
        return fn(*args), meta
    fn, cell = build()
    out = fn(*args)
    meta = cell.get("meta")
    _STAGE_CACHE[sig] = (fn, meta)
    return out, meta


def clear_dstage_cache() -> None:
    _STAGE_CACHE.clear()

"""Device mesh + table sharding.

This layer has NO reference counterpart (the reference is single-node;
SURVEY §2.17): it is the TPU-native replacement for NUMA placement —
tables hash- or range-partitioned over a 1-D device mesh, with
collectives (all_to_all / psum / all_gather) standing in for the
reference's shared-memory access.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyrise_tpu.storage.column import Column
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import LANE, padded_size

SHARD_AXIS = "shards"


class QueryMesh:
    """1-D mesh over which base tables are partitioned."""

    def __init__(self, devices: Optional[List] = None):
        devices = devices if devices is not None else jax.devices()
        self.mesh = Mesh(np.array(devices), (SHARD_AXIS,))
        self.n = len(devices)

    @property
    def axis(self) -> str:
        return SHARD_AXIS

    def sharding(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    def row_sharded(self) -> NamedSharding:
        return self.sharding(P(SHARD_AXIS))

    def replicated(self) -> NamedSharding:
        return self.sharding(P())


@dataclass
class ShardedColumn:
    """(n_shards, rows_per_shard) device array + validity, row-sharded."""

    data: jax.Array
    validity: Optional[jax.Array]
    dictionary: Optional[np.ndarray]


@dataclass
class ShardedTable:
    """Table partitioned row-wise across the mesh.  `row_valid` masks real
    rows per shard (shards may be unevenly filled)."""

    column_names: List[str]
    columns: List[ShardedColumn]
    row_valid: jax.Array  # (n_shards, rows_per_shard) bool
    num_rows: int
    mesh: QueryMesh

    @property
    def rows_per_shard(self) -> int:
        return int(self.row_valid.shape[1])


def partition_table(table: Table, qmesh: QueryMesh,
                    rows_per_shard: Optional[int] = None) -> ShardedTable:
    """Round-robin block partitioning: row r -> shard r // rps."""
    # compact pending selections (num_rows is only an upper bound under a
    # selection mask) and decode packed/RLE payloads — shards ship raw
    table = table.materialize().decoded()
    n = table.num_rows
    ndev = qmesh.n
    if rows_per_shard is None:
        rows_per_shard = padded_size(-(-max(n, 1) // ndev), LANE)
    cap = ndev * rows_per_shard
    idx = jnp.arange(cap)
    valid_flat = idx < n
    shard_cols: List[ShardedColumn] = []
    row_sharding = qmesh.sharding(P(SHARD_AXIS, None))
    for col in table.columns:
        src = col.data
        take_idx = jnp.clip(idx, 0, src.shape[0] - 1)
        data = jnp.take(src, take_idx).reshape(ndev, rows_per_shard)
        data = jax.device_put(data, row_sharding)
        validity = None
        if col.validity is not None:
            validity = jnp.take(col.validity, take_idx).reshape(ndev, rows_per_shard)
            validity = jax.device_put(validity, row_sharding)
        shard_cols.append(ShardedColumn(data, validity, col.dictionary))
    row_valid = jax.device_put(
        valid_flat.reshape(ndev, rows_per_shard), row_sharding
    )
    return ShardedTable(list(table.column_names), shard_cols, row_valid, n, qmesh)

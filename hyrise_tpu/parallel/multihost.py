"""Multi-process (multi-host) support helpers.

A JAX "process" is the unit of host failure and DCN attachment: on real
TPU pods each host drives its local chips and arrays over the global
mesh are only partially addressable from any one process.  The
distributed executor (parallel/dexec.py) is already SPMD — every process
runs the identical host program and the collectives span the global
mesh — so the only places that need multi-process awareness are the
host/device boundaries:

- fetching a globally-sharded array to host (gather_dtable) must
  all-gather across processes instead of np.asarray;
- reading a replicated sync scalar (shuffle-overflow counts) must read a
  locally addressable shard instead of the whole array.

The reference has no counterpart (single node, shared memory); this is
the DCN leg of SURVEY §2.17's NUMA→mesh mapping.  Entry point for
workers: `initialize(coordinator, num_processes, process_id)`; tests
simulate 2 hosts x 4 CPU devices via jax.distributed over Gloo
(tests/test_multihost.py).
"""

from __future__ import annotations

import jax
import numpy as np


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the global mesh.  On TPU pods the runtime usually autodetects
    (call with no explicit coordinator via jax.distributed.initialize());
    this wrapper exists for explicit CPU/DCN simulation and tests."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_fetch(arr) -> np.ndarray:
    """Fetch a (possibly cross-process) sharded array to host as a full
    global ndarray.  Single-process arrays take the direct path."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def sync_scalar_int(arr, index: int = 0) -> int:
    """Read one element of a per-shard-replicated sync vector (e.g. the
    pmax'd overflow counts, out_specs P(axis)): every shard holds the
    same value, so the first locally addressable shard suffices — no
    cross-process traffic."""
    if getattr(arr, "is_fully_addressable", True):
        return int(np.asarray(arr)[index])
    shard = arr.addressable_shards[0]
    return int(np.asarray(shard.data).reshape(-1)[0])

"""hyrise_tpu — a TPU-native, in-memory, vectorized SQL query engine.

A from-scratch re-design of the capabilities of the Hyrise research database
(reference: hyrise/hyrise, C++) for TPUs: columnar storage in fixed-width
padded device arrays with validity masks, dictionary-encoded strings, a SQL
front end, rule- and cost-based optimization, and physical operators that
compile to static dataflows of XLA/Pallas kernels.  Multi-chip scaling uses
`jax.sharding` meshes with all-to-all shuffles for joins and aggregates.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  types        -- core enums/dtypes            (ref: src/lib/types.hpp)
  storage      -- Table/Column/encodings/MVCC  (ref: src/lib/storage/)
  kernels      -- device compute primitives    (ref: inner loops of operators)
  expression   -- expression tree + evaluator  (ref: src/lib/expression/)
  operators    -- physical operators (PQP)     (ref: src/lib/operators/)
  plan         -- logical query plan (LQP)     (ref: src/lib/logical_query_plan/)
  optimizer    -- rewrite rules + join order   (ref: src/lib/optimizer/)
  statistics   -- histograms, cardinality      (ref: src/lib/statistics/)
  sql          -- lexer/parser/translator      (ref: src/lib/sql/ + sql-parser)
  scheduler    -- task DAG execution           (ref: src/lib/scheduler/)
  concurrency  -- MVCC transactions            (ref: src/lib/concurrency/)
  parallel     -- mesh sharding + shuffles     (new: no reference counterpart)
  server       -- PostgreSQL wire protocol     (ref: src/lib/server/)
  meta         -- meta tables / settings / log (ref: src/lib/utils/meta_tables/)
  benchmark    -- TPC-H/SSB/... harness        (ref: src/benchmarklib/)
"""

from __future__ import annotations

import os

import jax

# 64-bit support: TPC-H needs int64 row ids at large scale factors and
# f64 final aggregation for parity with the host oracle.  Hot paths keep
# data in 32-bit; f64 is used only where precision requires it.
if os.environ.get("HYRISE_TPU_X64", "1") == "1":
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: query-stage executables survive across
# processes (critical on remote-compile TPU backends where each stage
# compile costs seconds).  The default lives INSIDE the repo checkout —
# /tmp does not survive host recycling, and a cold cache costs ~75 s of
# remote compiles per TPC-H query.  TPU executables are device artifacts
# (not host-specific), and JAX keys every entry by backend + compiler
# fingerprint, so a stale cache degrades to a miss, never a crash.


def _default_cache_dir() -> str:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(repo_root, ".jax_cache")


_cache_dir = os.environ.get("HYRISE_TPU_COMPILE_CACHE")
if _cache_dir is None:
    # Default-enable only for accelerator backends (remote compiles cost
    # seconds each).  XLA:CPU executable deserialization has segfaulted on
    # same-host reloads (feature-check issue), so CPU runs opt in via env.
    _platforms = os.environ.get("JAX_PLATFORMS", "")
    _cache_dir = (
        _default_cache_dir()
        if ("axon" in _platforms or "tpu" in _platforms)
        else ""
    )
if _cache_dir:
    try:
        # (JAX keys cache entries by backend fingerprint; CPU AOT reloads
        # can warn about target-feature supersets — warning-only)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from hyrise_tpu.database import Database  # noqa: E402
from hyrise_tpu.version import __version__  # noqa: E402

__all__ = ["Database", "__version__"]

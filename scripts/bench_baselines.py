"""Shared persisted-baseline helpers for bench.py and the baseline
generator (ref: benchmark_runner.hpp:71-77 + benchmark_sql_executor.cpp —
report/verify separated from measurement): sqlite times + verified result
rows precompute OFFLINE per (suite, scale, seed, query) so the driver's
TPU budget is spent on the engine."""

from __future__ import annotations

import gzip
import hashlib
import json
import os
from typing import Dict, Optional

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUITE_SEEDS = {"tpch": 19920101, "ssb": 42, "tpcds": 20030101}

_GENERATOR_FILES = {
    "tpch": "hyrise_tpu/benchmark/tpch/generator.py",
    "ssb": "hyrise_tpu/benchmark/ssb/generator.py",
    "tpcds": "hyrise_tpu/benchmark/tpcds/generator.py",
}

# Everything between the generator's RNG and the bytes sqlite sees: the
# SSB/TPC-DS oracles load through device tables, so encode/decode and
# to_pylist changes ALTER the loaded data without touching generator.py.
# Round 4's TPC-DS baseline went stale exactly this way (Q1 "TPU rows
# mismatch" was really a stale-baseline mismatch).
_SHARED_DATA_FILES = (
    "hyrise_tpu/storage/compression.py",
    "hyrise_tpu/utils/load_table.py",
)


def generator_fingerprint(suite: str) -> str:
    """Hash of the generator source plus the shared data-path sources: a
    change in any of them means changed oracle data, silently invalidating
    stored rows — loaders check this."""
    h = hashlib.sha256()
    for rel in (_GENERATOR_FILES[suite],) + _SHARED_DATA_FILES:
        with open(os.path.join(_ROOT, rel), "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


def baseline_path(suite: str, sf: float, seed: Optional[int] = None,
                  skewed: bool = False) -> str:
    if seed is None:
        seed = SUITE_SEEDS[suite]
    tag = f"{suite}_sf{sf:g}_seed{seed}" + ("_skew" if skewed else "")
    return os.path.join(_ROOT, "benchmark_baselines", f"{tag}.json.gz")


def load_baseline(suite: str, sf: float, seed: Optional[int] = None,
                  skewed: bool = False) -> Optional[Dict]:
    """The committed baseline for (suite, sf, seed), or None when missing
    or stale (generator changed since it was computed)."""
    path = baseline_path(suite, sf, seed, skewed)
    if not os.path.exists(path):
        return None
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    if data.get("generator_sha") != generator_fingerprint(suite):
        return None
    return data


def save_baseline(suite: str, sf: float, payload: Dict,
                  seed: Optional[int] = None, skewed: bool = False) -> str:
    path = baseline_path(suite, sf, seed, skewed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as fh:
        json.dump(payload, fh)
    return path


def suite_queries(suite: str) -> Dict:
    """qid -> SQL for each suite (qids: tpch ints, ssb '1.1' strings,
    tpcds ints)."""
    if suite == "tpch":
        from hyrise_tpu.benchmark.tpch.queries import TPCH_QUERIES

        return dict(TPCH_QUERIES)
    if suite == "ssb":
        from hyrise_tpu.benchmark.ssb.queries import SSB_QUERIES

        return dict(SSB_QUERIES)
    if suite == "tpcds":
        from hyrise_tpu.benchmark.tpcds.queries import TPCDS_QUERIES

        return dict(TPCDS_QUERIES)
    raise ValueError(suite)


def oracle_compatible_qids(suite: str):
    """qids whose SQL runs on sqlite after sqlite_compat (TPC-DS ROLLUP
    queries need hand-built oracles — tests cover those; the bench times
    them without a ratio)."""
    qs = suite_queries(suite)
    if suite == "tpcds":
        from hyrise_tpu.benchmark.tpcds.queries import ROLLUP_QIDS

        return [q for q in sorted(qs) if q not in ROLLUP_QIDS]
    return sorted(qs)


def generate_into_oracle(suite: str, sf: float, oracle,
                         seed: Optional[int] = None, skewed: bool = False):
    """Generate the suite's tables and load them into the sqlite oracle.
    TPC-H loads from HOST numpy (exact f64); SSB/TPC-DS load via device
    tables, which is exact on the CPU backend this runs on."""
    if seed is None:
        seed = SUITE_SEEDS[suite]
    if suite == "tpch":
        from hyrise_tpu.benchmark.tpch.generator import TPCHTableGenerator

        gen = TPCHTableGenerator(scale_factor=sf, seed=seed,
                                 keep_host=True, skewed=skewed)
        gen.generate()
        for name, (data, typs) in gen.host_tables.items():
            oracle.load_numpy(name, data, typs)
        return
    if suite == "ssb":
        from hyrise_tpu.benchmark.ssb.generator import SSBTableGenerator

        tables = SSBTableGenerator(scale_factor=sf, seed=seed).generate()
    elif suite == "tpcds":
        from hyrise_tpu.benchmark.tpcds.generator import TPCDSTableGenerator

        tables = TPCDSTableGenerator(scale_factor=sf, seed=seed).generate()
    else:
        raise ValueError(suite)
    for name, t in tables.items():
        oracle.load_table(name, t)

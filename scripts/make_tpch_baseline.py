"""Precompute the sqlite TPC-H baseline (times + verified result rows) so
bench.py spends its driver budget on the ENGINE, not on re-running sqlite
every round (ref: benchmark_runner.hpp:71-77 + benchmark_sql_executor.cpp —
report/verify are separated from measurement).

Writes benchmark_baselines/tpch_sf{sf}_seed{seed}[_skew].json.gz with, per
query: the sqlite wall time, the baseline config that produced it
(unindexed, or indexed when the unindexed run exceeded the cap), and the
full canonical result rows for row-parity verification.

Runs on CPU only.  Usage:
    python scripts/make_tpch_baseline.py [--sf 0.1] [--seed 19920101]
        [--cap 60] [--queries 1,2,...] [--skew]
"""

from __future__ import annotations

import argparse
import gzip
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Indexes used for the "indexed" fallback runs: standard TPC-H join keys.
# They only make the baseline STRONGER (faster), so ratios stay honest.
INDEX_DDL = [
    "CREATE INDEX idx_l_orderkey ON lineitem (l_orderkey)",
    "CREATE INDEX idx_l_partkey ON lineitem (l_partkey)",
    "CREATE INDEX idx_l_suppkey ON lineitem (l_suppkey)",
    "CREATE INDEX idx_l_pk_sk ON lineitem (l_partkey, l_suppkey)",
    "CREATE INDEX idx_o_orderkey ON orders (o_orderkey)",
    "CREATE INDEX idx_o_custkey ON orders (o_custkey)",
    "CREATE INDEX idx_c_custkey ON customer (c_custkey)",
    "CREATE INDEX idx_c_nationkey ON customer (c_nationkey)",
    "CREATE INDEX idx_p_partkey ON part (p_partkey)",
    "CREATE INDEX idx_s_suppkey ON supplier (s_suppkey)",
    "CREATE INDEX idx_s_nationkey ON supplier (s_nationkey)",
    "CREATE INDEX idx_ps_partkey ON partsupp (ps_partkey)",
    "CREATE INDEX idx_ps_suppkey ON partsupp (ps_suppkey)",
    "CREATE INDEX idx_n_nationkey ON nation (n_nationkey)",
    "CREATE INDEX idx_r_regionkey ON region (r_regionkey)",
]


def generator_fingerprint() -> str:
    """Hash of the generator source: a changed generator means changed data,
    which silently invalidates stored rows — bench.py checks this."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "hyrise_tpu", "benchmark", "tpch", "generator.py",
    )
    with open(path, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()[:16]


def baseline_path(sf: float, seed: int, skewed: bool) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tag = f"tpch_sf{sf:g}_seed{seed}" + ("_skew" if skewed else "")
    return os.path.join(root, "benchmark_baselines", f"{tag}.json.gz")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=19920101)
    ap.add_argument("--cap", type=float, default=60.0,
                    help="unindexed per-query cap (s); indexed retry has 10x")
    ap.add_argument("--queries", type=str, default="")
    ap.add_argument("--skew", action="store_true")
    args = ap.parse_args()

    from hyrise_tpu.benchmark.tpch.generator import TPCHTableGenerator
    from hyrise_tpu.benchmark.tpch.queries import TPCH_QUERIES
    from tests.sqlite_oracle import SQLiteOracle
    from tests.test_tpch import sqlite_compat

    qids = ([int(x) for x in args.queries.split(",") if x.strip()]
            or sorted(TPCH_QUERIES))

    t0 = time.perf_counter()
    gen = TPCHTableGenerator(scale_factor=args.sf, seed=args.seed,
                             keep_host=True, skewed=args.skew)
    gen.generate()
    host_tables = gen.host_tables
    print(f"generated SF{args.sf:g} host data in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    oracle = SQLiteOracle()
    t0 = time.perf_counter()
    for name, (data, typs) in host_tables.items():
        oracle.load_numpy(name, data, typs)
    print(f"loaded sqlite in {time.perf_counter() - t0:.1f}s", flush=True)

    path = baseline_path(args.sf, args.seed, args.skew)
    existing = {}
    if os.path.exists(path):
        with gzip.open(path, "rt") as fh:
            existing = json.load(fh).get("queries", {})

    def run_capped(sql: str, cap_s: float):
        deadline = time.perf_counter() + cap_s
        oracle.conn.set_progress_handler(
            lambda: 1 if time.perf_counter() > deadline else 0, 200_000)
        t0 = time.perf_counter()
        try:
            rows = oracle.execute(sql)
            return time.perf_counter() - t0, rows
        except Exception:
            return None, None
        finally:
            oracle.conn.set_progress_handler(None, 0)

    # Pass 1: every query unindexed (the round-over-round comparable
    # config).  Pass 2: build indexes, rerun only the capped queries — a
    # STRONGER baseline for the pathological-in-sqlite shapes (correlated
    # Q4/Q17), so their ratios stay honest rather than absent.
    queries = dict(existing)
    todo = []
    for qid in qids:
        sql = sqlite_compat(TPCH_QUERIES[qid])
        sha = hashlib.sha256(sql.encode()).hexdigest()[:16]
        prior = existing.get(str(qid))
        if prior and prior.get("sql_sha") == sha:
            print(f"Q{qid}: cached ({prior['seconds']:.2f}s "
                  f"{prior['config']})", flush=True)
            continue
        secs, rows = run_capped(sql, args.cap)
        if secs is None:
            todo.append((qid, sql, sha))
            print(f"Q{qid}: exceeded unindexed cap — queued for indexed run",
                  flush=True)
            continue
        queries[str(qid)] = {
            "seconds": secs, "config": "unindexed", "sql_sha": sha,
            "n_rows": len(rows), "rows": [list(r) for r in rows],
        }
        print(f"Q{qid}: {secs:.3f}s unindexed {len(rows)} rows", flush=True)

    if todo:
        t0 = time.perf_counter()
        for ddl in INDEX_DDL:
            oracle.conn.execute(ddl)
        oracle.conn.commit()
        print(f"built indexes in {time.perf_counter() - t0:.1f}s", flush=True)
        for qid, sql, sha in todo:
            secs, rows = run_capped(sql, args.cap * 10)
            if secs is None:
                print(f"Q{qid}: EXCEEDED cap even indexed — skipped",
                      flush=True)
                continue
            queries[str(qid)] = {
                "seconds": secs, "config": "indexed", "sql_sha": sha,
                "n_rows": len(rows), "rows": [list(r) for r in rows],
            }
            print(f"Q{qid}: {secs:.3f}s indexed {len(rows)} rows", flush=True)
    out = {
        "benchmark": "tpch", "sf": args.sf, "seed": args.seed,
        "skewed": args.skew,
        "generator_sha": generator_fingerprint(),
        "sqlite": __import__("sqlite3").sqlite_version,
        "created": time.strftime("%Y-%m-%d"),
        "queries": queries,
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as fh:
        json.dump(out, fh)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, "
          f"{len(queries)} queries)", flush=True)


if __name__ == "__main__":
    main()

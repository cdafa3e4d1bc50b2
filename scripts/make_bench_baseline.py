"""Precompute a suite's sqlite baseline (times + verified result rows) —
see scripts/bench_baselines.py for the why and the storage format.

Runs on CPU only.  Usage:
    python scripts/make_bench_baseline.py --suite tpch --sf 0.1 [--cap 60]
    python scripts/make_bench_baseline.py --suite ssb --sf 1
    python scripts/make_bench_baseline.py --suite tpcds --sf 0.01
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_baselines import (
    SUITE_SEEDS,
    generate_into_oracle,
    generator_fingerprint,
    load_baseline,
    oracle_compatible_qids,
    save_baseline,
    suite_queries,
)

# Indexes for the "indexed" fallback runs (queries exceeding the
# unindexed cap): standard join keys per suite.  They only make the
# baseline STRONGER (faster), so ratios stay honest.
INDEX_DDL = {
    "tpch": [
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
    ],
    "ssb": [
        "CREATE INDEX idx_lo_orderdate ON lineorder (lo_orderdate)",
        "CREATE INDEX idx_lo_partkey ON lineorder (lo_partkey)",
        "CREATE INDEX idx_lo_suppkey ON lineorder (lo_suppkey)",
        "CREATE INDEX idx_lo_custkey ON lineorder (lo_custkey)",
        "CREATE INDEX idx_d_datekey ON date (d_datekey)",
        "CREATE INDEX idx_p_partkey ON part (p_partkey)",
        "CREATE INDEX idx_s_suppkey ON supplier (s_suppkey)",
        "CREATE INDEX idx_c_custkey ON customer (c_custkey)",
    ],
    "tpcds": [
        "CREATE INDEX idx_ss_sold_date ON store_sales (ss_sold_date_sk)",
        "CREATE INDEX idx_ss_item ON store_sales (ss_item_sk)",
        "CREATE INDEX idx_cs_sold_date ON catalog_sales (cs_sold_date_sk)",
        "CREATE INDEX idx_ws_sold_date ON web_sales (ws_sold_date_sk)",
        "CREATE INDEX idx_d_date_sk ON date_dim (d_date_sk)",
        "CREATE INDEX idx_i_item_sk ON item (i_item_sk)",
    ],
}


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel

    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=("tpch", "ssb", "tpcds"),
                    default="tpch")
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--cap", type=float, default=60.0,
                    help="unindexed per-query cap (s); indexed retry has 10x")
    ap.add_argument("--queries", type=str, default="")
    ap.add_argument("--skew", action="store_true")
    args = ap.parse_args()
    suite = args.suite
    seed = args.seed if args.seed is not None else SUITE_SEEDS[suite]

    from tests.sqlite_oracle import SQLiteOracle
    from tests.test_tpch import sqlite_compat

    queries = suite_queries(suite)
    compat_qids = set(oracle_compatible_qids(suite))
    if args.queries:
        want = set(args.queries.split(","))
        qids = [q for q in sorted(queries) if str(q) in want]
    else:
        qids = [q for q in sorted(queries) if q in compat_qids]

    t0 = time.perf_counter()
    oracle = SQLiteOracle()
    generate_into_oracle(suite, args.sf, oracle, seed=seed, skewed=args.skew)
    print(f"generated+loaded {suite} SF{args.sf:g} into sqlite in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    existing = {}
    prior = load_baseline(suite, args.sf, seed, args.skew)
    if prior:
        existing = prior.get("queries", {})

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

    out_queries = dict(existing)
    todo = []
    for qid in qids:
        sql = sqlite_compat(queries[qid])
        sha = hashlib.sha256(sql.encode()).hexdigest()[:16]
        prior_q = existing.get(str(qid))
        if prior_q and prior_q.get("sql_sha") == sha:
            print(f"Q{qid}: cached ({prior_q['seconds']:.2f}s "
                  f"{prior_q['config']})", flush=True)
            continue
        secs, rows = run_capped(sql, args.cap)
        if secs is None:
            todo.append((qid, sql, sha))
            print(f"Q{qid}: exceeded unindexed cap — queued for indexed run",
                  flush=True)
            continue
        out_queries[str(qid)] = {
            "seconds": secs, "config": "unindexed", "sql_sha": sha,
            "n_rows": len(rows), "rows": [list(r) for r in rows],
        }
        print(f"Q{qid}: {secs:.3f}s unindexed {len(rows)} rows", flush=True)

    if todo:
        t0 = time.perf_counter()
        for ddl in INDEX_DDL.get(suite, []):
            oracle.conn.execute(ddl)
        oracle.conn.commit()
        print(f"built indexes in {time.perf_counter() - t0:.1f}s", flush=True)
        for qid, sql, sha in todo:
            secs, rows = run_capped(sql, args.cap * 10)
            if secs is None:
                print(f"Q{qid}: EXCEEDED cap even indexed — skipped",
                      flush=True)
                continue
            out_queries[str(qid)] = {
                "seconds": secs, "config": "indexed", "sql_sha": sha,
                "n_rows": len(rows), "rows": [list(r) for r in rows],
            }
            print(f"Q{qid}: {secs:.3f}s indexed {len(rows)} rows", flush=True)

    payload = {
        "benchmark": suite, "sf": args.sf, "seed": seed,
        "skewed": args.skew,
        "generator_sha": generator_fingerprint(suite),
        "sqlite": __import__("sqlite3").sqlite_version,
        "created": time.strftime("%Y-%m-%d"),
        "queries": out_queries,
    }
    path = save_baseline(suite, args.sf, payload, seed, args.skew)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, "
          f"{len(out_queries)} queries)", flush=True)


if __name__ == "__main__":
    main()

"""Join Order Benchmark runner (ref: benchmark/join_order_benchmark.cpp /
hyriseBenchmarkJoinOrder).

Data source, in order of preference:
  --tables DIR      real IMDB tables on disk (.tbl/.csv/.npz), as the
                    reference uses after scripts/setup_imdb.py
  --scale-factor    synthetic IMDB (same 21-table schema + join graph;
                    benchmark/job/generator.py) when no dataset is local

Run: python -m hyrise_tpu.benchmark.job_benchmark [-s 0.02] [--verify]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--scale-factor", type=float, default=0.02)
    ap.add_argument("--tables", default=None,
                    help="directory with real IMDB tables")
    ap.add_argument("--queries", default=None,
                    help="directory with the original .sql files "
                         "(defaults to the built-in query set)")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--verify", action="store_true",
                    help="differential-check every query against sqlite")
    args = ap.parse_args()

    from hyrise_tpu.database import Database
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder

    db = Database.get()
    t0 = time.perf_counter()
    if args.tables:
        from hyrise_tpu.benchmark.file_based_benchmark import (
            load_tables_from_dir,
        )

        tables = load_tables_from_dir(args.tables)
    else:
        from hyrise_tpu.benchmark.job.generator import IMDBTableGenerator

        tables = IMDBTableGenerator(args.scale_factor).generate_into(
            db.storage_manager)
    rows = sum(t.num_rows for t in tables.values())
    print(f"# IMDB ({'real' if args.tables else 'synthetic'}): "
          f"{rows} rows in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    if args.queries:
        from hyrise_tpu.benchmark.file_based_benchmark import (
            load_queries_from_dir,
        )

        queries = load_queries_from_dir(args.queries)
    else:
        from hyrise_tpu.benchmark.job.queries import JOB_QUERIES

        queries = JOB_QUERIES

    oracle = None
    if args.verify:
        from tests.sqlite_oracle import SQLiteOracle

        oracle = SQLiteOracle()
        for name, t in tables.items():
            oracle.load_table(name, t)

    times = {}
    for qid in sorted(queries):
        sql = queries[qid]
        try:
            result = SQLPipelineBuilder(sql).create_pipeline().get_result_table()
            best = math.inf
            for _ in range(args.runs):
                s = time.perf_counter()
                SQLPipelineBuilder(sql).create_pipeline().get_result_table()
                best = min(best, time.perf_counter() - s)
            verified = ""
            if oracle is not None:
                from tests.sqlite_oracle import rows_match

                ok = rows_match(result.to_pylist(), oracle.execute(sql),
                                ordered=False)
                verified = " rows-OK" if ok else " ROWS-MISMATCH"
            times[qid] = best
            print(f"# {qid}: {best * 1e3:.1f} ms{verified}", file=sys.stderr)
        except Exception as exc:
            print(f"# {qid} FAILED: {exc}", file=sys.stderr)
    if times:
        geo = math.exp(sum(math.log(t) for t in times.values()) / len(times))
        print(json.dumps({
            "metric": "job_geomean_query_time",
            "value": round(geo * 1e3, 3), "unit": "ms",
            "queries": len(times),
        }))


if __name__ == "__main__":
    main()

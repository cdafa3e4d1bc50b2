"""TPC-DS benchmark binary (ref: benchmark/tpcds_benchmark.cpp /
hyriseBenchmarkTPCDS).  Store-sales channel subset (see tpcds/queries.py).

Run: python -m hyrise_tpu.benchmark.tpcds_benchmark -s 0.1 --verify
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="hyrise_tpu TPC-DS benchmark")
    ap.add_argument("-s", "--scale", type=float, default=1.0)
    ap.add_argument("-q", "--queries", type=str, default=None)
    ap.add_argument("-r", "--runs", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--shuffled", action="store_true")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("-o", "--output", type=str, default=None)
    args = ap.parse_args(argv)

    from hyrise_tpu.benchmark.runner import BenchmarkConfig, BenchmarkRunner
    from hyrise_tpu.benchmark.tpcds.generator import TPCDSTableGenerator
    from hyrise_tpu.benchmark.tpcds.queries import TPCDS_QUERIES
    from hyrise_tpu.database import Database

    qids = (
        [int(x) for x in args.queries.split(",")] if args.queries
        else sorted(TPCDS_QUERIES)
    )
    db = Database.get()
    print(f"- generating TPC-DS SF{args.scale} (store channel) ...",
          file=sys.stderr)
    tables = TPCDSTableGenerator(scale_factor=args.scale).generate_into(
        db.storage_manager
    )
    print(f"- {sum(t.num_rows for t in tables.values())} rows", file=sys.stderr)

    verify_fn = None
    if args.verify:
        sys.path.insert(0, ".")
        from tests.sqlite_oracle import SQLiteOracle, rows_match
        from tests.test_tpch import sqlite_compat

        oracle = SQLiteOracle()
        for name, t in tables.items():
            oracle.load_table(name, t)

        def verify_fn(sql, rows):
            return rows_match(rows, oracle.execute(sqlite_compat(sql)),
                              ordered=False)

    runner = BenchmarkRunner(
        {f"TPC-DS {q:02d}": TPCDS_QUERIES[q] for q in qids},
        BenchmarkConfig(warmup_runs=args.warmup, max_runs=args.runs,
                        shuffled=args.shuffled, verify=args.verify),
        verify_fn=verify_fn,
    )
    report = runner.run()
    for item in report["benchmarks"]:
        v = ""
        if item["verified"] is not None:
            v = " OK" if item["verified"] else " VERIFY-FAILED"
        print(f"{item['name']}: best {item['best_ms']:.1f} ms{v}",
              file=sys.stderr)
    print(f"geomean(best): {report['summary']['geomean_best_ms']} ms",
          file=sys.stderr)
    text = json.dumps(report, indent=2)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(text)
    else:
        print(text)


if __name__ == "__main__":
    main()

"""File-based benchmark (ref: benchmark/file_based_benchmark.cpp /
hyriseBenchmarkFileBased): run every .sql query in a directory against
tables loaded from .tbl/.csv/.npz files in a table directory.  This is the
harness used for the Join Order Benchmark (IMDB) when its dataset is
available on disk (ref: benchmark/join_order_benchmark.cpp loads
third_party/join-order-benchmark SQL + downloaded IMDB tables).

Run: python -m hyrise_tpu.benchmark.file_based_benchmark \
        --tables DIR --queries DIR [--verify]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def load_tables_from_dir(table_dir: str) -> dict:
    from contextlib import nullcontext

    from hyrise_tpu.database import Database
    from hyrise_tpu.storage.column import bulk_encode
    from hyrise_tpu.storage.storage_manager import packed_encoding_enabled
    from hyrise_tpu.utils.load_table import load_table

    db = Database.get()
    loaded = {}
    for path in sorted(
        glob.glob(os.path.join(table_dir, "*.tbl"))
        + glob.glob(os.path.join(table_dir, "*.csv"))
        + glob.glob(os.path.join(table_dir, "*.npz"))
    ):
        name = os.path.basename(path).rsplit(".", 1)[0]
        with bulk_encode() if packed_encoding_enabled() else nullcontext():
            table = load_table(path)
        if db.storage_manager.has_table(name):
            db.storage_manager.replace_table(name, table)
        else:
            db.storage_manager.add_table(name, table, encode=True)
        loaded[name] = table
    return loaded


def load_queries_from_dir(query_dir: str) -> dict:
    queries = {}
    for path in sorted(glob.glob(os.path.join(query_dir, "*.sql"))):
        name = os.path.basename(path)[:-4]
        with open(path) as fh:
            queries[name] = fh.read()
    return queries


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="hyrise_tpu file-based benchmark")
    ap.add_argument("--tables", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("-r", "--runs", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--shuffled", action="store_true")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("-o", "--output", type=str, default=None)
    args = ap.parse_args(argv)

    from hyrise_tpu.benchmark.runner import BenchmarkConfig, BenchmarkRunner

    tables = load_tables_from_dir(args.tables)
    print(f"- loaded {len(tables)} tables", file=sys.stderr)
    queries = load_queries_from_dir(args.queries)
    print(f"- loaded {len(queries)} queries", file=sys.stderr)

    verify_fn = None
    if args.verify:
        sys.path.insert(0, ".")
        from tests.sqlite_oracle import SQLiteOracle, rows_match

        oracle = SQLiteOracle()
        for name, t in tables.items():
            oracle.load_table(name, t)

        def verify_fn(sql, rows):
            return rows_match(rows, oracle.execute(sql), ordered=False)

    runner = BenchmarkRunner(
        queries,
        BenchmarkConfig(warmup_runs=args.warmup, max_runs=args.runs,
                        shuffled=args.shuffled, verify=args.verify),
        verify_fn=verify_fn,
    )
    report = runner.run()
    for item in report["benchmarks"]:
        print(f"{item['name']}: best {item['best_ms']:.1f} ms", file=sys.stderr)
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

"""Run bench.py for a suite on the real TPU and record the per-query
results as a committed artifact (TPCH22_TPU.json / SSB_TPU.json /
TPCDS_TPU.json style).

Usage:
    python scripts/record_tpu_suite.py --suite tpch --sf 0.1 \
        --out TPCH22_TPU.json --budget 1800
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="tpch")
    ap.add_argument("--sf", type=float, default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=float, default=1800)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default=None)
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    env = dict(os.environ,
               HYRISE_TPU_BENCH_SUITE=args.suite,
               HYRISE_TPU_BENCH_BUDGET=str(args.budget),
               HYRISE_TPU_BENCH_RUNS=str(args.runs))
    if args.sf is not None:
        env["HYRISE_TPU_BENCH_SF"] = f"{args.sf:g}"
    if args.queries:
        env["HYRISE_TPU_BENCH_QUERIES"] = args.queries

    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env,
        timeout=args.budget + 300,
    )
    wall = time.perf_counter() - t0
    sys.stderr.write(proc.stderr)
    sys.stdout.write(proc.stdout)

    per_query = {}
    for line in proc.stderr.splitlines():
        m = re.match(
            r"# Q([\w.]+): ([0-9.]+) ms(?: \(([0-9.]+)x vs sqlite\))?"
            r"( rows-OK| ROWS-MISMATCH)?", line)
        if m:
            per_query[f"Q{m.group(1)}"] = {
                "warm_ms": float(m.group(2)),
                "vs_sqlite": float(m.group(3)) if m.group(3) else None,
                "rows_ok": (m.group(4) or "").strip() == "rows-OK",
            }
    summary = None
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            summary = json.loads(line)

    sf = args.sf if args.sf is not None else env.get("HYRISE_TPU_BENCH_SF")
    out = {
        "config": f"{args.suite} SF{sf}, one real TPU chip (v5e) via remote "
                  f"tunnel, warm (best of {args.runs} after warmup), "
                  "persisted sqlite baseline on identical data "
                  "(scripts/make_bench_baseline.py)",
        "date": time.strftime("%Y-%m-%d"),
        "wall_s": round(wall, 1),
        "queries_measured": len(per_query),
        "all_measured_rows_ok": all(
            v["rows_ok"] for v in per_query.values()) if per_query else False,
        "summary": summary,
        "notes": [args.note] if args.note else [],
        "per_query": per_query,
    }
    with open(os.path.join(ROOT, args.out), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {args.out}: {len(per_query)} queries, "
          f"summary={summary}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""TPC-C benchmark binary (ref: benchmark/tpcc_benchmark.cpp /
hyriseBenchmarkTPCC): run the weighted transaction mix, report tps.

Run: python -m hyrise_tpu.benchmark.tpcc_benchmark -w 1 --seconds 10
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="hyrise_tpu TPC-C benchmark")
    ap.add_argument("-w", "--warehouses", type=int, default=1)
    ap.add_argument("--density", type=float, default=0.01,
                    help="per-warehouse row-count scale (1.0 = spec)")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from hyrise_tpu.benchmark.tpcc.generator import TPCCTableGenerator
    from hyrise_tpu.benchmark.tpcc.procedures import PROCEDURES
    from hyrise_tpu.database import Database

    db = Database.get()
    gen = TPCCTableGenerator(args.warehouses, density=args.density)
    print(f"- generating TPC-C ({args.warehouses} warehouses, "
          f"density {args.density}) ...", file=sys.stderr)
    gen.generate_into(db.storage_manager)

    rng = random.Random(args.seed)
    weights = [(cls, w) for cls, w in PROCEDURES.values()]
    names = list(PROCEDURES.keys())
    counts = {n: 0 for n in names}
    aborts = 0
    start = time.perf_counter()
    while time.perf_counter() - start < args.seconds:
        r = rng.random()
        acc = 0.0
        for name, (cls, w) in PROCEDURES.items():
            acc += w
            if r <= acc or name == names[-1]:
                proc = cls(rng, args.warehouses, gen.n_items,
                           gen.districts_per_w, gen.customers_per_d)
                ok = proc.run()
                counts[name] += 1
                if not ok:
                    aborts += 1
                break
    elapsed = time.perf_counter() - start
    total = sum(counts.values())
    report = {
        "warehouses": args.warehouses,
        "density": args.density,
        "seconds": round(elapsed, 2),
        "transactions": counts,
        "total": total,
        "aborts": aborts,
        "tps": round(total / elapsed, 2),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

"""Per-stage TPU wall-time breakdown for the slow SF1 TPC-H queries.

Runs each query once warm, then re-runs with HYRISE_TPU_PROFILE_STAGES
sync-per-stage timing and prints the top stages — the evidence base for
the gather/join optimization work (VERDICT r3 weak #5).

Run: python scripts/profile_sf1_stages.py [--sf 1] [--queries 7,20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--queries", default="3,5,7,10,20,21")
    ap.add_argument("--out", default="SF1_STAGE_PROFILE.json")
    args = ap.parse_args(argv)

    os.environ["HYRISE_TPU_PROFILE_STAGES"] = "1"

    import jax

    from hyrise_tpu import _default_cache_dir

    jax.config.update("jax_compilation_cache_dir", _default_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from hyrise_tpu.benchmark.tpch.generator import TPCHTableGenerator
    from hyrise_tpu.database import Database
    from hyrise_tpu.operators import compiled
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
    from scripts.bench_baselines import SUITE_SEEDS, suite_queries

    queries = suite_queries("tpch")
    db = Database.get()
    gen = TPCHTableGenerator(scale_factor=args.sf, seed=SUITE_SEEDS["tpch"])
    gen.generate_into(db.storage_manager)
    print(f"# generated SF{args.sf}", flush=True)

    report = {}
    for qid in [int(x) for x in args.queries.split(",")]:
        sql = queries[qid]
        # warm (compile + caches), untimed
        SQLPipelineBuilder(sql).create_pipeline().get_result_table()
        compiled.STAGE_TIMES.clear()
        t0 = time.perf_counter()
        SQLPipelineBuilder(sql).create_pipeline().get_result_table()
        wall = time.perf_counter() - t0
        stages = sorted(compiled.STAGE_TIMES.items(), key=lambda kv: -kv[1])
        print(f"\n== Q{qid}: {wall * 1e3:.1f} ms total "
              f"({sum(compiled.STAGE_TIMES.values()) * 1e3:.1f} ms in stages)",
              flush=True)
        for tag, sec in stages[:14]:
            print(f"   {sec * 1e3:9.1f} ms  {tag}", flush=True)
        report[f"Q{qid}"] = {
            "wall_ms": round(wall * 1e3, 1),
            "stages_ms": {t: round(s * 1e3, 1) for t, s in stages},
        }

    with open(args.out, "w") as fh:
        json.dump({"sf": args.sf, "date": time.strftime("%Y-%m-%d"),
                   "note": "sync-per-stage timing; each stage pays the "
                           "~24 ms tunnel RTT on top of its device time",
                   "queries": report}, fh, indent=1)
    print(f"\n# wrote {args.out}")


if __name__ == "__main__":
    main()

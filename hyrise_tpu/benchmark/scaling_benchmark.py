"""Scaling-efficiency benchmark: rows/s of the distributed
scan+aggregate and shuffle-join steps at 1..N shards (BASELINE target:
>=80% rows/s efficiency 1 chip -> N).

On a virtual CPU mesh the numbers measure simulation overhead, not real
scaling — run on multi-chip hardware for the real curve.

Run: python -m hyrise_tpu.benchmark.scaling_benchmark [--rows 1048576]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--platform", default="cpu",
                    help="cpu (virtual mesh; default) or empty for the "
                         "machine default")
    ap.add_argument("--out", default=None,
                    help="write SCALING.json-style artifact here")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        # must run BEFORE first jax use; the env var alone is overridden
        # by the machine's sitecustomize (see CLAUDE.md)
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from hyrise_tpu.parallel.distributed import (
        make_distributed_join_agg_step,
        make_distributed_scan_agg_step,
    )
    from hyrise_tpu.parallel.mesh import QueryMesh

    devices = jax.devices()
    rng = np.random.default_rng(0)
    results = []
    shard_counts = [n for n in (1, 2, 4, 8, 16) if n <= len(devices)]
    base_rps = {}
    for n in shard_counts:
        qmesh = QueryMesh(devices[:n])
        rows = args.rows
        rps = max(rows // n, 128)
        total = n * rps
        mask = jnp.asarray(rng.random(total) < 0.5).reshape(n, rps)
        slot = jnp.asarray(rng.integers(0, 16, total)).reshape(n, rps)
        val = jnp.asarray(rng.random(total)).reshape(n, rps)
        step = make_distributed_scan_agg_step(qmesh, num_groups=16)
        out = step(mask, slot, val)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = step(mask, slot, val)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        rows_per_s = total / best
        base = base_rps.setdefault("scan", rows_per_s / n)
        results.append({
            "step": "scan_aggregate", "shards": n,
            "rows_per_s_m": round(rows_per_s / 1e6, 1),
            "efficiency": round(rows_per_s / (base * n), 3),
        })
    for n in shard_counts:
        qmesh = QueryMesh(devices[:n])
        rps = max(args.rows // (4 * n), 128)
        total = n * rps
        keys = jnp.asarray(rng.integers(0, total, total)).reshape(n, rps)
        valid = jnp.ones((n, rps), dtype=bool)
        slot = jnp.asarray(rng.integers(0, 16, total)).reshape(n, rps)
        val = jnp.asarray(rng.random(total)).reshape(n, rps)
        bkeys = jnp.asarray(rng.integers(0, total, total)).reshape(n, rps)
        step = make_distributed_join_agg_step(
            qmesh, bucket_cap=max(2 * rps // n, 128),
            join_out_cap=4 * rps, num_groups=16,
        )
        out = step(keys, valid, slot, val, bkeys, valid)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = step(keys, valid, slot, val, bkeys, valid)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        rows_per_s = total / best
        base = base_rps.setdefault("join", rows_per_s / n)
        results.append({
            "step": "shuffle_join_aggregate", "shards": n,
            "rows_per_s_m": round(rows_per_s / 1e6, 1),
            "efficiency": round(rows_per_s / (base * n), 3),
        })
    # ---- full SQL over the mesh (parallel/dexec.py): the end-to-end
    # scaling number — TPC-H Q6 (scan+psum) and Q1 (grouped aggregate with
    # pre-aggregation + shuffle) from SQL text at each shard count
    from hyrise_tpu.benchmark.tpch.generator import TPCHTableGenerator
    from hyrise_tpu.benchmark.tpch.queries import TPCH_QUERIES
    from hyrise_tpu.database import Database
    from hyrise_tpu.parallel.dtable import clear_dstage_cache
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder

    sf = max(args.rows / 6_000_000, 0.002)
    db = Database.get()
    tables = TPCHTableGenerator(scale_factor=sf).generate_into(
        db.storage_manager)
    li_rows = tables["lineitem"].num_rows
    for qid in (6, 1):
        sql_text = TPCH_QUERIES[qid]
        for n in shard_counts:
            db.storage_manager._sharded.clear()
            clear_dstage_cache()
            db.default_lqp_cache.clear()
            db.distribute(mesh=QueryMesh(devices[:n]))
            run = lambda: SQLPipelineBuilder(
                sql_text).create_pipeline().get_result_table()
            run()  # warm/compile
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            rows_per_s = li_rows / best
            base = base_rps.setdefault(f"sql_q{qid}", rows_per_s / n)
            results.append({
                "step": f"sql_tpch_q{qid}", "shards": n,
                "rows_per_s_m": round(rows_per_s / 1e6, 1),
                "efficiency": round(rows_per_s / (base * n), 3),
            })
    # ---- collective-cost breakdown: time the raw collectives the query
    # steps lower to (psum for pre-aggregated reduction, all_to_all for
    # the shuffle join, all_gather for broadcast joins) at each shard
    # count, so the efficiency curve can be attributed
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    collectives = []
    for n in shard_counts:
        if n < 2:
            continue
        mesh = Mesh(np.array(devices[:n]), ("x",))
        rps = max(args.rows // n, 128)
        x = jnp.asarray(rng.random((n, rps), dtype=np.float32))

        def timed(fn, *inp):
            out = fn(*inp)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                out = fn(*inp)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            return best * 1e3

        def shmap(f):
            return jax.jit(shard_map(
                f, mesh=mesh, in_specs=P("x", None), out_specs=P("x", None),
                check_rep=False,
            ))

        ent = {"shards": n, "rows_per_shard": rps}
        ent["psum_ms"] = round(timed(
            shmap(lambda a: jax.lax.psum(a, "x") * 0 + a), x), 3)
        ent["all_gather_ms"] = round(timed(
            shmap(lambda a: jnp.sum(
                jax.lax.all_gather(a, "x"), axis=0, keepdims=True)), x), 3)
        ent["all_to_all_ms"] = round(timed(
            shmap(lambda a: jax.lax.all_to_all(
                a.reshape(1, n, rps // n), "x", 1, 1
            ).reshape(1, rps)), x), 3)
        collectives.append(ent)

    for r in results:
        print(f"{r['step']:<24} shards={r['shards']:<3} "
              f"{r['rows_per_s_m']:>8.1f} M rows/s  eff={r['efficiency']}",
              file=sys.stderr)
    if args.out:
        artifact = {
            "config": (
                f"platform={args.platform or 'default'}, "
                f"{len(devices)} devices, rows={args.rows}, "
                "virtual-CPU-mesh numbers measure SPMD program overhead "
                "and memory-bandwidth sharing, not ICI; on real v5e "
                "meshes the collectives ride 1.6 TB/s ICI links so the "
                "curve should be strictly better for bandwidth-bound "
                "steps and similar for latency-bound ones"
            ),
            "date": time.strftime("%Y-%m-%d"),
            "results": results,
            "collective_ms": collectives,
        }
        with open(args.out, "w") as fh:
            json.dump(artifact, fh, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

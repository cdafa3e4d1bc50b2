"""TPC-C benchmark binary (ref: benchmark/tpcc_benchmark.cpp /
hyriseBenchmarkTPCC): run the weighted transaction mix, report tps.

`--baseline` additionally runs the IDENTICAL transaction mix (same
procedures, same statements, same RNG schedule) against an in-memory
sqlite on the same host and reports both throughputs — the reference
publishes no TPC-C numbers (README.md:35), so a locally-measured host
engine on identical data is the recorded baseline, matching bench.py's
TPC-H methodology.

Run: python -m hyrise_tpu.benchmark.tpcc_benchmark -w 1 --seconds 10 --baseline
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time


def _run_mix(make_proc, seconds: float, seed: int, periodic=None):
    """Drive the weighted mix for `seconds`; returns (counts, aborts, tps).
    `make_proc(name, rng) -> procedure` so engine and baseline runs share
    the exact transaction schedule (same seed, same weights).  `periodic`
    (engine runs: the MVCC GC pass) is called between transactions and
    its time COUNTS toward the wall clock."""
    from hyrise_tpu.benchmark.tpcc.procedures import PROCEDURES

    rng = random.Random(seed)
    names = list(PROCEDURES.keys())
    counts = {n: 0 for n in names}
    aborts = 0
    start = time.perf_counter()
    while time.perf_counter() - start < seconds:
        if periodic is not None:
            periodic()
        r = rng.random()
        acc = 0.0
        for name, (cls, w) in PROCEDURES.items():
            acc += w
            if r <= acc or name == names[-1]:
                ok = make_proc(name, rng).run()
                if ok:
                    # tps counts COMMITTED transactions only — counting
                    # aborted ones inflated contended multi-client runs
                    counts[name] += 1
                else:
                    aborts += 1
                break
    elapsed = time.perf_counter() - start
    return counts, aborts, sum(counts.values()) / elapsed


def _sqlite_env(gen, tables):
    """Load the generated tables into an in-memory sqlite and build
    procedure subclasses whose statements execute there.  The statement
    text is reused VERBATIM (both engines take `?` placeholders)."""
    import sqlite3

    sys.path.insert(0, ".")
    from tests.sqlite_oracle import SQLiteOracle

    oracle = SQLiteOracle()
    for name, t in tables.items():
        oracle.load_table(name, t)
    conn = oracle.conn

    from hyrise_tpu.benchmark.tpcc.procedures import PROCEDURES

    made = {}
    for name, (cls, w) in PROCEDURES.items():

        class SqliteProc(cls):  # type: ignore[valid-type, misc]
            def _exec(self, pname, text, params, ctx):
                cur = conn.execute(text, tuple(params))
                return [tuple(r) for r in cur.fetchall()]

            def run(self) -> bool:
                try:
                    self._execute(None)
                    conn.commit()
                    return True
                except sqlite3.Error:
                    conn.rollback()
                    return False

        made[name] = SqliteProc
    return made


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="hyrise_tpu TPC-C benchmark")
    ap.add_argument("-w", "--warehouses", type=int, default=1)
    ap.add_argument("--density", type=float, default=0.01,
                    help="per-warehouse row-count scale (1.0 = spec)")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--warmup", type=float, default=20.0,
                    help="seconds of mix execution before the timed window "
                         "(compiles every statement shape; ref: "
                         "benchmark_config.hpp warmup)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--clients", type=int, default=1,
                    help="concurrent client threads driving independent "
                         "mixes (ref: benchmark_config.hpp:17-55 clients; "
                         "MVCC serializes conflicts, aborted transactions "
                         "count as aborts)")
    ap.add_argument("--baseline", action="store_true",
                    help="also run the identical mix on in-memory sqlite")
    ap.add_argument("--platform", default=None, choices=("cpu", "axon"),
                    help="force the jax backend (the machine-level env "
                         "default routes through the remote TPU tunnel, "
                         "whose per-statement latency dominates OLTP)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    # persistent compilation cache: repeat runs skip statement compiles
    # entirely (bench.py does the same for TPC-H)
    try:
        import jax

        from hyrise_tpu import _default_cache_dir

        jax.config.update("jax_compilation_cache_dir", _default_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from hyrise_tpu.benchmark.tpcc.generator import TPCCTableGenerator
    from hyrise_tpu.benchmark.tpcc.procedures import PROCEDURES
    from hyrise_tpu.database import Database

    db = Database.get()
    gen = TPCCTableGenerator(args.warehouses, density=args.density)
    print(f"- generating TPC-C ({args.warehouses} warehouses, "
          f"density {args.density}) ...", file=sys.stderr)
    tables = gen.generate_into(db.storage_manager)

    sqlite_procs = None
    if args.baseline:
        # snapshot into sqlite BEFORE the engine run mutates the tables,
        # so both engines start from identical state
        print("- loading sqlite baseline ...", file=sys.stderr)
        sqlite_procs = _sqlite_env(gen, tables)

    def make_engine_proc(name, rng, home=None):
        cls = PROCEDURES[name][0]
        return cls(rng, args.warehouses, gen.n_items,
                   gen.districts_per_w, gen.customers_per_d, home=home)

    # warmup pass: compile every statement shape once so the timed window
    # measures steady-state OLTP latency, not XLA compiles (ref:
    # benchmark_config.hpp warmup duration + cached per-procedure PQPs).
    # NewOrder alone has 11 multi-row insert shapes (5-15 lines), so the
    # warmup drives the full mix for --warmup seconds.
    warm_rng = random.Random(args.seed + 1)
    warm_start = time.perf_counter()
    warm_n = 0
    while time.perf_counter() - warm_start < args.warmup:
        for name in PROCEDURES:
            try:
                make_engine_proc(name, warm_rng).run()
                warm_n += 1
            except Exception as exc:  # pragma: no cover - diagnostics only
                print(f"- warmup {name} failed: {exc}", file=sys.stderr)
    print(f"- warmup: {warm_n} transactions in "
          f"{time.perf_counter() - warm_start:.1f}s", file=sys.stderr)

    # MVCC garbage collection runs as in the reference's deployed posture
    # (MvccDeletePlugin background loop, mvcc_delete_plugin.hpp:34-68):
    # version churn otherwise grows every hot table past its padded
    # capacity, recompiling the whole statement-stage cache per growth.
    from hyrise_tpu.plugins.mvcc_delete_plugin import MvccDeletePlugin

    gc_plugin = MvccDeletePlugin()
    gc_state = {"last": time.perf_counter()}

    def periodic_gc():
        now = time.perf_counter()
        if now - gc_state["last"] >= 2.0:
            gc_plugin.clean_all()
            gc_state["last"] = now

    if args.clients <= 1:
        counts, aborts, tps = _run_mix(
            make_engine_proc, args.seconds, args.seed, periodic=periodic_gc)
    else:
        # each client drives its own mix schedule; the GC pass stays on
        # client 0 (clean_all takes the engine-global maintenance locks)
        import threading

        results = [None] * args.clients

        def client(k: int):
            # TPC-C terminal binding: each client is a terminal pinned to
            # one (warehouse, district) — without it clients collide on
            # the district row and abort each other (42% aborts at 4
            # clients/1 warehouse in round 4)
            # warehouses round-robin FIRST: the warehouse row itself is a
            # Payment hotspot (w_ytd), so co-locating two clients in one
            # warehouse aborts ~10% of the mix on the CAS
            home = (1 + k % args.warehouses,
                    1 + (k // args.warehouses) % gen.districts_per_w)
            results[k] = _run_mix(
                lambda name, rng: make_engine_proc(name, rng, home=home),
                args.seconds, args.seed + 101 * k,
                periodic=periodic_gc if k == 0 else None)

        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        counts = {n: sum(r[0][n] for r in results) for n in results[0][0]}
        aborts = sum(r[1] for r in results)
        tps = sum(counts.values()) / wall
    report = {
        "warehouses": args.warehouses,
        "density": args.density,
        "seconds": args.seconds,
        "clients": args.clients,
        "transactions": counts,
        "total": sum(counts.values()),
        "aborts": aborts,
        "tps": round(tps, 2),
    }

    if args.baseline:

        def make_sqlite_proc(name, rng):
            return sqlite_procs[name](rng, args.warehouses, gen.n_items,
                                      gen.districts_per_w, gen.customers_per_d)

        b_counts, b_aborts, b_tps = _run_mix(
            make_sqlite_proc, args.seconds, args.seed
        )
        report["sqlite_tps"] = round(b_tps, 2)
        report["sqlite_total"] = sum(b_counts.values())
        report["vs_sqlite"] = round(tps / b_tps, 4) if b_tps else None

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

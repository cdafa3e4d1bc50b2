"""Benchmark entry point for the driver: runs TPC-H on the real TPU and
prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline = sqlite (host CPU) wall time / our wall time on the same
queries+data (the reference publishes no numbers — README.md:35 — so the
recorded baseline is a locally-measured host engine on identical data).

Env knobs: HYRISE_TPU_BENCH_SF (default 0.1), HYRISE_TPU_BENCH_QUERIES
(comma list, default a TPC-H subset), HYRISE_TPU_BENCH_RUNS (default 3).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time


def _emit(suite, sf, our_times, sqlite_times) -> None:
    if not our_times:
        print(json.dumps({"metric": f"{suite}_sf{sf}_geomean_query_time",
                          "value": -1, "unit": "ms", "vs_baseline": 0.0}),
              flush=True)
        return
    geo = math.exp(sum(math.log(t) for t in our_times.values()) / len(our_times))
    vs = 0.0
    common = [q for q in our_times if q in sqlite_times]
    if common:
        vs = math.exp(
            sum(math.log(sqlite_times[q] / our_times[q]) for q in common)
            / len(common)
        )
    print(json.dumps({
        "metric": f"{suite}_sf{sf}_geomean_query_time",
        "value": round(geo * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(vs, 3),
    }), flush=True)


def supervise() -> None:
    """Run the benchmark in a CHILD process and guarantee the driver one
    JSON line even when the TPU tunnel wedges: a wedged backend init
    blocks inside a native call where Python signal handlers never fire,
    so the child cannot rescue itself — the parent kills it with SIGKILL
    at the deadline and emits the empty metric."""
    import subprocess

    budget_s = float(os.environ.get("HYRISE_TPU_BENCH_BUDGET", "480"))
    env = dict(os.environ, HYRISE_TPU_BENCH_CHILD="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE, env=env, text=True,
    )
    try:
        out, _ = proc.communicate(timeout=budget_s + 120)
    except subprocess.TimeoutExpired:
        proc.kill()  # exact PID; SIGTERM cannot reach a wedged native call
        try:
            out, _ = proc.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            out = ""
        print("# benchmark child exceeded its deadline (wedged TPU "
              "tunnel?) — killed", file=sys.stderr, flush=True)
    line = next(
        (ln for ln in (out or "").splitlines() if ln.startswith("{")), None
    )
    if line is None:
        suite = os.environ.get("HYRISE_TPU_BENCH_SUITE", "tpch")
        sf = os.environ.get("HYRISE_TPU_BENCH_SF", "0.1")
        line = json.dumps({
            "metric": f"{suite}_sf{sf}_geomean_query_time",
            "value": -1, "unit": "ms", "vs_baseline": 0.0,
        })
    print(line, flush=True)


def main() -> None:
    import signal

    # persistent compilation cache: repeat runs skip the (remote) compiles
    try:
        import jax

        from hyrise_tpu import _default_cache_dir

        cache_dir = os.environ.get(
            "HYRISE_TPU_COMPILE_CACHE", _default_cache_dir()
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    suite = os.environ.get("HYRISE_TPU_BENCH_SUITE", "tpch")
    sf = float(os.environ.get(
        "HYRISE_TPU_BENCH_SF", {"tpch": "0.1", "ssb": "1",
                                "tpcds": "0.01"}[suite]))
    skewed = (suite == "tpch"
              and os.environ.get("HYRISE_TPU_BENCH_SKEW", "0") == "1")
    runs = int(os.environ.get("HYRISE_TPU_BENCH_RUNS", "3"))
    budget_s = float(os.environ.get("HYRISE_TPU_BENCH_BUDGET", "480"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from scripts.bench_baselines import (
        SUITE_SEEDS,
        load_baseline,
        suite_queries,
    )

    queries = suite_queries(suite)
    # TPC-H: core driver subset first (the metric-bearing 8), then the
    # rest of the 22 — with a warm compile cache (committed under
    # .jax_cache) the whole suite fits the budget; cold, the loop stops
    # when the next query's estimated cost would overrun the deadline.
    qids_env = os.environ.get("HYRISE_TPU_BENCH_QUERIES")
    if qids_env:
        want = [x.strip() for x in qids_env.split(",") if x.strip()]
        by_str = {str(q): q for q in queries}
        qids = [by_str[w] for w in want if w in by_str]
    elif suite == "tpch":
        core = [1, 3, 5, 6, 10, 12, 14, 19]
        qids = core + [q for q in sorted(queries) if q not in core]
    else:
        qids = sorted(queries)
    start_all = time.perf_counter()

    # emit partial results if the driver kills us mid-compile
    state = {"our": {}, "sqlite": {}, "emitted": False}

    def on_term(signum, frame):
        if not state["emitted"]:
            state["emitted"] = True
            _emit(suite, sf, state["our"], state["sqlite"])
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    from hyrise_tpu.database import Database
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder

    # ---- persisted sqlite baseline (times + verified rows), committed by
    # scripts/make_bench_baseline.py: the driver budget is spent on the
    # ENGINE, not on re-running sqlite every round (ref:
    # benchmark_runner.hpp:71-77 — report/verify separate from measurement).
    seed = SUITE_SEEDS[suite]
    baseline = None
    try:
        baseline = load_baseline(suite, sf, seed, skewed)
        if baseline is not None:
            print(f"# using persisted sqlite baseline for {suite} sf{sf} "
                  f"({len(baseline['queries'])} queries)", file=sys.stderr)
        else:
            print("# no (or stale) persisted baseline — live sqlite "
                  "fallback where possible", file=sys.stderr)
    except Exception as exc:
        print(f"# persisted baseline unavailable: {exc}", file=sys.stderr)

    db = Database.get()
    gen_start = time.perf_counter()
    gen = None
    if suite == "tpch":
        from hyrise_tpu.benchmark.tpch.generator import TPCHTableGenerator

        gen = TPCHTableGenerator(scale_factor=sf, seed=seed,
                                 keep_host=baseline is None, skewed=skewed)
        tables = gen.generate_into(db.storage_manager)
    elif suite == "ssb":
        from hyrise_tpu.benchmark.ssb.generator import SSBTableGenerator

        tables = SSBTableGenerator(scale_factor=sf, seed=seed).generate_into(
            db.storage_manager)
    else:
        from hyrise_tpu.benchmark.tpcds.generator import TPCDSTableGenerator

        tables = TPCDSTableGenerator(scale_factor=sf, seed=seed).generate_into(
            db.storage_manager)
    gen_s = time.perf_counter() - gen_start
    total_rows = sum(t.num_rows for t in tables.values())
    print(f"# generated {suite} SF{sf}: {total_rows} rows in {gen_s:.1f}s",
          file=sys.stderr)

    # ---- live sqlite oracle fallback on identical data (capped wall
    # time; TPC-H only).  Loaded from the generator's HOST numpy (not
    # device tables): the TPU's f64 emulation perturbs round-tripped
    # values and corrupts the oracle.
    baseline_cap_s = float(os.environ.get("HYRISE_TPU_BENCH_BASELINE_CAP", "30"))
    oracle = None
    if baseline is None and suite == "tpch":
        try:
            from tests.sqlite_oracle import SQLiteOracle

            oracle = SQLiteOracle()
            for name, (data, typs) in gen.host_tables.items():
                oracle.load_numpy(name, data, typs)
            gen.host_tables = {}
        except Exception as exc:  # baseline is best-effort
            print(f"# sqlite baseline unavailable: {exc}", file=sys.stderr)

    verify = os.environ.get("HYRISE_TPU_BENCH_VERIFY", "1") == "1"

    def sqlite_run(qid):
        """-> (seconds, rows) or (None, None) past the cap / missing."""
        if baseline is not None:
            ent = baseline["queries"].get(str(qid))
            if ent is None:
                return None, None
            return ent["seconds"], [tuple(r) for r in ent["rows"]]
        if oracle is None:
            return None, None
        from tests.test_tpch import sqlite_compat

        deadline = time.perf_counter() + baseline_cap_s
        oracle.conn.set_progress_handler(
            lambda: 1 if time.perf_counter() > deadline else 0, 200_000
        )
        t0 = time.perf_counter()
        try:
            rows = oracle.execute(sqlite_compat(queries[qid]))
            return time.perf_counter() - t0, rows
        except Exception:
            return None, None  # interrupted past the cap or unsupported
        finally:
            oracle.conn.set_progress_handler(None, 0)

    # ---- interleaved: our engine (warmup + timed), then capped baseline
    sqlite_times = state["sqlite"]
    our_times = state["our"]
    # The parent SIGKILLs at budget_s + 120; stop when the next query's
    # estimated wall (scaled worst observed, incl. cold compiles) would
    # overrun budget_s + 90, leaving 30 s of emission margin.
    hard_deadline = start_all + budget_s + 90
    worst_block = 0.0
    for qid in qids:
        est_next = 1.2 * worst_block
        if time.perf_counter() + est_next > hard_deadline:
            print(f"# budget exceeded, stopping before Q{qid}", file=sys.stderr,
                  flush=True)
            break
        block_start = time.perf_counter()
        sql = queries[qid]
        try:
            warm = SQLPipelineBuilder(sql).create_pipeline().get_result_table()
            our_rows = warm.to_pylist() if warm is not None else []
            best = math.inf
            for _ in range(runs):
                t0 = time.perf_counter()
                SQLPipelineBuilder(sql).create_pipeline().get_result_table()
                best = min(best, time.perf_counter() - t0)
            base, base_rows = sqlite_run(qid)
            verified = ""
            if verify and base_rows is not None:
                from tests.sqlite_oracle import rows_match_with_ties

                ok = rows_match_with_ties(sql, our_rows, base_rows,
                                          ordered=False)
                verified = " rows-OK" if ok else " ROWS-MISMATCH"
                if not ok:
                    print(f"# Q{qid} row mismatch: ours={len(our_rows)} "
                          f"sqlite={len(base_rows)}", file=sys.stderr,
                          flush=True)
            our_times[qid] = best
            if base is not None:
                sqlite_times[qid] = base
            ratio = f" ({base / best:.2f}x vs sqlite)" if base else ""
            print(f"# Q{qid}: {best * 1e3:.1f} ms{ratio}{verified}",
                  file=sys.stderr, flush=True)
        except Exception as exc:
            print(f"# Q{qid} FAILED: {exc}", file=sys.stderr, flush=True)
        worst_block = max(worst_block, time.perf_counter() - block_start)

    state["emitted"] = True
    _emit(suite, sf, our_times, sqlite_times)


if __name__ == "__main__":
    if os.environ.get("HYRISE_TPU_BENCH_CHILD") == "1":
        main()
    else:
        supervise()

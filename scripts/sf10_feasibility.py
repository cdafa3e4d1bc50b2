"""TPC-H SF10 single-chip feasibility: generate at a given scale, apply
the packed/dictionary encodings, and report the EXACT per-column device
footprint — then extrapolate to SF10 and optionally run Q1/Q6 on the real
TPU (BASELINE.md row 4: 'TPC-H SF10 full 22 queries' is the reference's
default scale, tpch_benchmark.cpp:55).

Footprint math runs host-side at a sampling scale (default 1.0) because
encodings' bit widths are range-driven and ranges scale predictably:
key spans grow linearly with SF (orderkey ~6M*SF -> ceil(log2) bits),
dates/flags/quantities stay constant, f64 measure columns stay 8 B/row.

Usage (CPU, footprint only):
    python scripts/sf10_feasibility.py --sf 1 --report SF10_FEASIBILITY.json
On the TPU (loads at --load-sf and times Q1/Q6):
    python scripts/sf10_feasibility.py --load-sf 10 --queries 1,6
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROW_COUNTS_PER_SF = {  # spec rows per SF=1 (tpch spec table sizes)
    "lineitem": 6_001_215, "orders": 1_500_000, "partsupp": 800_000,
    "part": 200_000, "customer": 150_000, "supplier": 10_000,
    "nation": 25, "region": 5,
}


def column_bytes(col, n_rows: int) -> dict:
    """(kind, bytes) for one encoded column at its current size."""
    from hyrise_tpu.storage.compression import PackedArray, RLEArray

    d = col.data
    if isinstance(d, PackedArray):
        return {"kind": f"packed{d.bit_width}", "bytes": int(d.words.nbytes)}
    if isinstance(d, RLEArray):
        return {"kind": "rle",
                "bytes": int(d.values.nbytes + d.run_ends.nbytes)}
    kind = str(d.dtype)
    extra = 0
    if col.dictionary is not None:
        kind = f"dict[{len(col.dictionary)}]+{d.dtype}"
    if col.validity is not None:
        extra = int(col.validity.nbytes)
    return {"kind": kind, "bytes": int(d.nbytes) + extra}


def bits_for_span(span: int) -> int:
    for bw in (1, 2, 4, 8, 16, 32):
        if span <= (1 << bw) - 1:
            return bw
    return 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0,
                    help="sampling scale for the measured footprint")
    ap.add_argument("--target-sf", type=float, default=10.0)
    ap.add_argument("--load-sf", type=float, default=None,
                    help="actually load this scale onto the device and "
                         "run --queries (TPU run)")
    ap.add_argument("--queries", type=str, default="1,6")
    ap.add_argument("--report", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu or args.load_sf is None:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hyrise_tpu.benchmark.tpch.generator import TPCHTableGenerator
    from hyrise_tpu.database import Database

    sf = args.load_sf if args.load_sf is not None else args.sf
    db = Database.get()
    t0 = time.perf_counter()
    gen = TPCHTableGenerator(scale_factor=sf)
    tables = gen.generate_into(db.storage_manager)
    gen_s = time.perf_counter() - t0
    print(f"# generated+loaded SF{sf:g} in {gen_s:.1f}s", file=sys.stderr)

    report = {"measured_sf": sf, "target_sf": args.target_sf,
              "tables": {}, "totals": {}}
    total = 0
    for name, t in tables.items():
        cols = {}
        tbytes = 0
        for cname, col in zip(t.column_names, t.columns):
            info = column_bytes(col, t.num_rows)
            cols[cname] = info
            tbytes += info["bytes"]
        report["tables"][name] = {
            "rows": t.num_rows, "capacity": t.capacity,
            "bytes": tbytes, "columns": cols,
        }
        total += tbytes
        print(f"# {name}: {t.num_rows} rows, {tbytes / 1e6:.1f} MB",
              file=sys.stderr)
    report["totals"]["device_bytes_measured"] = total

    # ---- extrapolation to target SF: bytes/row is nearly scale-free
    # except FOR bit widths on key columns, which widen with the span.
    scale = args.target_sf / sf
    extrap = 0
    for name, ent in report["tables"].items():
        rows10 = int(ent["rows"] * scale) if name in ROW_COUNTS_PER_SF else ent["rows"]
        per_row = ent["bytes"] / max(ent["rows"], 1)
        # key-width growth: +log2(scale) bits on packed int key columns
        widen = 1.0
        grow_bits = max(math.log2(max(scale, 1)), 0)
        packed_cols = [c for c in ent["columns"].values()
                       if c["kind"].startswith("packed")]
        if packed_cols and grow_bits:
            cur_bits = sum(int(c["kind"][6:]) for c in packed_cols)
            new_bits = sum(
                bits_for_span((1 << int(c["kind"][6:])) * int(scale))
                for c in packed_cols
            )
            packed_frac = sum(c["bytes"] for c in packed_cols) / max(ent["bytes"], 1)
            widen = 1 + packed_frac * (new_bits / max(cur_bits, 1) - 1)
        extrap += per_row * rows10 * widen
    # padding to power-of-two capacity buckets: worst case ~2x, typical ~1.1
    report["totals"]["device_bytes_target_sf"] = int(extrap)
    report["totals"]["device_bytes_target_sf_padded"] = int(extrap * 1.15)
    report["totals"]["hbm_bytes_v5e"] = 16 * 2**30
    report["totals"]["fits_v5e"] = extrap * 1.15 < 16 * 2**30 * 0.8
    print(f"# target SF{args.target_sf:g}: ~{extrap / 2**30:.2f} GiB "
          f"(+15% padding {extrap * 1.15 / 2**30:.2f} GiB) vs 16 GiB HBM "
          f"-> fits={report['totals']['fits_v5e']}", file=sys.stderr)

    if args.load_sf is not None:
        from hyrise_tpu.benchmark.tpch.queries import TPCH_QUERIES
        from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
        import numpy as np

        # honest timing through the tunnel: force one D2H first
        _ = np.asarray(db.storage_manager.get_table("nation").columns[0].data)
        qids = [int(x) for x in args.queries.split(",") if x.strip()]
        report["queries"] = {}
        for qid in qids:
            sql_text = TPCH_QUERIES[qid]
            r = (SQLPipelineBuilder(sql_text).create_pipeline()
                 .get_result_table())
            rows = r.to_pylist() if r is not None else []
            best = math.inf
            for _i in range(3):
                s = time.perf_counter()
                SQLPipelineBuilder(sql_text).create_pipeline() \
                    .get_result_table().to_pylist()
                best = min(best, time.perf_counter() - s)
            report["queries"][qid] = {"warm_ms": round(best * 1e3, 2),
                                      "rows": len(rows)}
            print(f"# Q{qid}: {best * 1e3:.1f} ms ({len(rows)} rows)",
                  file=sys.stderr)
            try:
                # REAL transient working-set evidence: device allocator
                # peak after the query (base tables + stage intermediates)
                stats = jax.devices()[0].memory_stats() or {}
                report["queries"][qid]["peak_hbm_gib"] = round(
                    stats.get("peak_bytes_in_use", 0) / 2**30, 2)
                report["queries"][qid]["hbm_in_use_gib"] = round(
                    stats.get("bytes_in_use", 0) / 2**30, 2)
            except Exception:
                pass

    if args.report:
        with open(args.report, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"# wrote {args.report}", file=sys.stderr)
    else:
        print(json.dumps(report["totals"]))


if __name__ == "__main__":
    main()

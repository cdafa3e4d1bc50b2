"""Emulated-f64 aggregate drift study (VERDICT r4 item 10).

The TPU emulates float64 with ~48 effective mantissa bits (double-f32
pairs); long sums — and especially the engine's cumsum-formulated sorted
segment sums — accumulate more rounding than a host f64 reduction.  This
underlies the TPC-DS Q1 TPU rows-mismatch (an AVG feeds a `>` predicate:
rows at the boundary flip) and bounds any future SF10 parity claim.

This script measures, on the CURRENT backend, the relative error vs a
numpy f64 ground truth of:
  - jnp.sum           (tree reduction)
  - jnp.cumsum[-1]    (the engine's segment_sum_sorted formulation)
  - grouped cumsum-diff segment sums at several group counts
over TPC-H/TPC-DS-like value distributions (prices ~ U[900, 105000],
quantities, signed deltas) at 10^6..10^7 rows.

Run on TPU: python scripts/f64_drift_study.py --out F64_DRIFT.json
Run on CPU (control): ... --platform cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="F64_DRIFT.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import hyrise_tpu  # noqa: F401  (enables x64 — else f64 silently
    #                    truncates to f32 and the study measures nothing)
    import jax.numpy as jnp

    assert jax.config.jax_enable_x64

    rng = np.random.default_rng(42)
    results = []

    def rel_err(approx, exact):
        if exact == 0:
            return abs(approx)
        return abs((approx - exact) / exact)

    dists = {
        "price": lambda n: rng.uniform(900.0, 105000.0, n),
        "quantity": lambda n: rng.integers(1, 51, n).astype(np.float64),
        "signed": lambda n: rng.standard_normal(n) * 1e4,
        # adversarial: large values with small deltas (cancellation)
        "offset": lambda n: 1e9 + rng.standard_normal(n),
    }
    for n in (1 << 20, 1 << 23):
        for dname, make in dists.items():
            vals = make(n)
            exact_sum = float(np.sum(vals, dtype=np.float64))
            exact_mean = exact_sum / n
            dv = jnp.asarray(vals, dtype=jnp.float64)
            s_tree = float(jnp.sum(dv))
            s_cum = float(jnp.cumsum(dv)[-1])
            m_tree = s_tree / n
            results.append({
                "rows": n, "dist": dname,
                "sum_tree_rel_err": rel_err(s_tree, exact_sum),
                "sum_cumsum_rel_err": rel_err(s_cum, exact_sum),
                "avg_tree_rel_err": rel_err(m_tree, exact_mean),
            })
            print(f"n={n} {dname:8s} tree={rel_err(s_tree, exact_sum):.3e} "
                  f"cumsum={rel_err(s_cum, exact_sum):.3e}", flush=True)

    # grouped: segment sums via the engine's sorted cumsum-diff kernel
    from hyrise_tpu.kernels.aggregates import segment_sum_sorted

    n = 1 << 22
    for groups in (8, 1024, 262144):
        vals = rng.uniform(900.0, 105000.0, n)
        seg = np.sort(rng.integers(0, groups, n))
        exact = np.zeros(groups)
        np.add.at(exact, seg, vals)
        out = segment_sum_sorted(
            jnp.asarray(vals, dtype=jnp.float64),
            jnp.asarray(seg, dtype=jnp.int64),
            jnp.ones(n, dtype=bool),
            num_segments=groups,
        )
        out_np = np.asarray(out)
        nz = exact != 0
        errs = np.abs((out_np[nz] - exact[nz]) / exact[nz])
        results.append({
            "rows": n, "dist": "price", "groups": groups,
            "segment_sum_max_rel_err": float(errs.max()),
            "segment_sum_mean_rel_err": float(errs.mean()),
        })
        print(f"groups={groups} seg max={errs.max():.3e} "
              f"mean={errs.mean():.3e}", flush=True)

    backend = jax.default_backend()
    policy = (
        "Policy: engine f64 sums on TPU carry ~1e-10 relative error at "
        "SF1-scale group sizes (emulated ~48-bit mantissa + cumsum "
        "formulation).  Differential tests therefore compare floats with "
        "rows_match's relative tolerance, never bit-exactly; predicates "
        "over aggregate results (HAVING x > AVG(...)-style) can "
        "legitimately flip rows whose margin is inside the envelope — "
        "oracle comparisons must treat those as ties, or the engine must "
        "compute the threshold on host (materialized subquery scalars "
        "already sync to host, so the dominant case is exact)."
    )
    with open(args.out, "w") as fh:
        json.dump({
            "backend": backend,
            "date": time.strftime("%Y-%m-%d"),
            "note": policy,
            "results": results,
        }, fh, indent=1)
    print(f"# wrote {args.out} (backend={backend})")


if __name__ == "__main__":
    main()

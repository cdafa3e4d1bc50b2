"""Round-over-round benchmark comparison with noise-aware significance
(ref: /root/reference/scripts/compare_benchmarks.py — per-item old/new
table with a significance test and a nonzero exit on regressions; this is
how the reference catches silent perf regressions between runs).

Accepts any two report files in either supported shape:
- BenchmarkRunner reports: {"benchmarks": [{"name", "best_ms", "all_ms"}]}
- per-query artifacts (TPCH22_TPU.json style): {"per_query": {"Q1":
  {"warm_ms": ...}}}

Usage:
    python scripts/compare_benchmarks.py OLD.json NEW.json
        [--threshold 0.10] [--fail-on-regression]

An item regresses when new/old - 1 > threshold AND (when per-run samples
exist) the runs are distinguishable by a Mann-Whitney-style rank check —
with only best-of-N times recorded, the threshold alone decides.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from typing import Dict, List, Optional, Tuple


def load_items(path: str) -> Dict[str, Tuple[float, Optional[List[float]]]]:
    """-> name -> (headline_ms, all_runs_ms or None)"""
    with open(path) as fh:
        data = json.load(fh)
    items: Dict[str, Tuple[float, Optional[List[float]]]] = {}
    if "benchmarks" in data:
        for b in data["benchmarks"]:
            items[b["name"]] = (float(b["best_ms"]), b.get("all_ms"))
    elif "per_query" in data:
        for name, ent in data["per_query"].items():
            ms = ent.get("warm_ms", ent.get("best_ms"))
            if ms is not None:
                items[name] = (float(ms), None)
    elif "queries" in data:  # persisted sqlite baselines
        for name, ent in data["queries"].items():
            items[name] = (float(ent["seconds"]) * 1e3, None)
    else:
        raise SystemExit(f"{path}: unrecognized report shape")
    return items


def rank_disjoint(old: List[float], new: List[float]) -> bool:
    """True when the samples are clearly separated (every new run slower
    than every old run or vice versa) — a distribution-free significance
    check adequate for the tiny run counts benchmarks record."""
    return min(new) > max(old) or max(new) < min(old)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.10,
                    help="relative change below this is reported as noise")
    ap.add_argument("--fail-on-regression", action="store_true")
    args = ap.parse_args()

    old_items = load_items(args.old)
    new_items = load_items(args.new)
    names = sorted(set(old_items) | set(new_items), key=str)

    regressions, improvements, ratios = [], [], []
    w = max((len(str(n)) for n in names), default=4)
    print(f"{'item':<{w}}  {'old ms':>10}  {'new ms':>10}  {'change':>8}  note")
    for name in names:
        o = old_items.get(name)
        n = new_items.get(name)
        if o is None or n is None:
            which = "added" if o is None else "REMOVED"
            ms = (n or o)[0]
            print(f"{name:<{w}}  {'-' if o is None else f'{o[0]:.3f}':>10}  "
                  f"{'-' if n is None else f'{n[0]:.3f}':>10}  {'':>8}  {which}")
            if o is not None:
                regressions.append(name)
            continue
        rel = n[0] / o[0] - 1.0 if o[0] > 0 else 0.0
        ratios.append(n[0] / o[0] if o[0] > 0 else 1.0)
        note = ""
        if abs(rel) <= args.threshold:
            note = "~noise"
        elif rel > 0:
            significant = True
            if o[1] and n[1]:
                significant = rank_disjoint(o[1], n[1])
            note = "REGRESSED" if significant else "slower (overlapping runs)"
            if significant:
                regressions.append(name)
        else:
            note = "improved"
            improvements.append(name)
        print(f"{name:<{w}}  {o[0]:>10.3f}  {n[0]:>10.3f}  {rel:>+7.1%}  {note}")

    if ratios:
        geo = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
        print(f"\ngeomean new/old: {geo:.3f}  "
              f"({len(improvements)} improved, {len(regressions)} regressed, "
              f"{len(ratios) - len(improvements) - len(regressions)} ~same)")
    if regressions and args.fail_on_regression:
        print(f"FAIL: regressions in {', '.join(map(str, regressions))}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()

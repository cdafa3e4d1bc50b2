"""Benchmark harness (ref: benchmarklib/benchmark_runner.hpp:40-108 —
Ordered vs Shuffled modes, warmup, max_runs/max_duration, multi-client,
JSON report with context, optional --verify against a host oracle;
benchmark_sql_executor.cpp for per-item verification)."""

from __future__ import annotations

import json
import math
import platform
import random
import subprocess
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
from hyrise_tpu.version import __version__


@dataclass
class BenchmarkConfig:
    """Ref: benchmarklib/benchmark_config.hpp:17-55."""

    warmup_runs: int = 1
    max_runs: int = 5
    max_duration_s: float = 60.0
    shuffled: bool = False
    clients: int = 1
    verify: bool = False
    seed: int = 0


@dataclass
class ItemResult:
    name: str
    runs_ms: List[float] = field(default_factory=list)
    rows: int = 0
    verified: Optional[bool] = None

    @property
    def best_ms(self) -> float:
        return min(self.runs_ms) if self.runs_ms else float("nan")

    @property
    def mean_ms(self) -> float:
        return sum(self.runs_ms) / len(self.runs_ms) if self.runs_ms else float("nan")


class BenchmarkRunner:
    def __init__(
        self,
        items: Dict[str, str],
        config: Optional[BenchmarkConfig] = None,
        verify_fn: Optional[Callable[[str, list], bool]] = None,
    ):
        """items: name -> SQL; verify_fn(sql, rows) -> ok (oracle check)."""
        self.items = items
        self.config = config or BenchmarkConfig()
        self.verify_fn = verify_fn
        self.results: Dict[str, ItemResult] = {}

    def run(self) -> Dict:
        cfg = self.config
        order = list(self.items)
        start_all = time.perf_counter()
        if cfg.shuffled:
            rng = random.Random(cfg.seed)
            schedule = []
            for _ in range(cfg.max_runs):
                batch = order[:]
                rng.shuffle(batch)
                schedule.extend(batch)
        else:
            schedule = [name for name in order for _ in range(cfg.max_runs)]

        # warmup (compiles)
        for name in order:
            for _ in range(cfg.warmup_runs):
                self._execute(name, record=False)

        for name in schedule:
            if time.perf_counter() - start_all > cfg.max_duration_s:
                break
            self._execute(name, record=True)
        return self.report()

    def _execute(self, name: str, record: bool) -> None:
        sql = self.items[name]
        t0 = time.perf_counter()
        table = SQLPipelineBuilder(sql).create_pipeline().get_result_table()
        rows = table.to_pylist() if table is not None else []
        elapsed_ms = (time.perf_counter() - t0) * 1e3
        if not record:
            if self.config.verify and self.verify_fn is not None:
                res = self.results.setdefault(name, ItemResult(name))
                res.verified = self.verify_fn(sql, rows)
            return
        res = self.results.setdefault(name, ItemResult(name))
        res.runs_ms.append(elapsed_ms)
        res.rows = len(rows)

    def report(self) -> Dict:
        items = []
        for name, res in self.results.items():
            items.append({
                "name": name,
                "runs": len(res.runs_ms),
                "best_ms": round(res.best_ms, 3),
                "mean_ms": round(res.mean_ms, 3),
                "all_ms": [round(x, 3) for x in res.runs_ms],
                "rows": res.rows,
                "verified": res.verified,
            })
        valid = [r for r in self.results.values() if r.runs_ms]
        geomean = (
            math.exp(sum(math.log(r.best_ms) for r in valid) / len(valid))
            if valid else float("nan")
        )
        return {
            "context": self._context(),
            "benchmarks": items,
            "summary": {
                "geomean_best_ms": round(geomean, 3),
                "items": len(items),
            },
        }

    def _context(self) -> Dict:
        import jax

        devices = jax.devices()
        return {
            "engine": f"hyrise_tpu {__version__}",
            "git": _git_hash(),
            "platform": platform.platform(),
            "backend": jax.default_backend(),
            "device_kind": devices[0].device_kind if devices else "none",
            "device_count": len(devices),
            "config": {
                "warmup_runs": self.config.warmup_runs,
                "max_runs": self.config.max_runs,
                "shuffled": self.config.shuffled,
                "clients": self.config.clients,
                "verify": self.config.verify,
            },
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }


def _git_hash() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        ).stdout.strip()
    except Exception:
        return "unknown"

"""Worker process for the multi-host distributed-SQL test.

Each worker is one simulated "host" (jax process) driving 4 virtual CPU
devices; 2 workers form a global 8-device mesh connected over Gloo (the
DCN stand-in).  Every worker runs the identical SPMD program: generate
deterministic TPC-H data, record single-chip results, distribute the
tables over the GLOBAL mesh, re-run the same SQL, and assert row parity.

Usage: python tests/mh_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

PROC = int(sys.argv[1])
NPROC = int(sys.argv[2])
PORT = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS_EXTRA", "")
)
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from hyrise_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"127.0.0.1:{PORT}", NPROC, PROC)

assert jax.process_count() == NPROC, jax.process_count()
assert jax.device_count() == 4 * NPROC, jax.device_count()

from hyrise_tpu.benchmark.tpch.generator import TPCHTableGenerator  # noqa: E402
from hyrise_tpu.database import Database  # noqa: E402
from hyrise_tpu.parallel import dexec  # noqa: E402
from hyrise_tpu.benchmark.tpch.queries import TPCH_QUERIES  # noqa: E402
from hyrise_tpu.sql.pipeline import sql  # noqa: E402


def canon(rows):
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in rows
    )


db = Database.get()
for name, t in TPCHTableGenerator(scale_factor=0.002).generate().items():
    db.storage_manager.add_table(name, t)

queries = {
    "q6": TPCH_QUERIES[6],
    "q1": TPCH_QUERIES[1],
    "q3": TPCH_QUERIES[3],
    # string-key distributed join (dictionary recode over the wire)
    "strjoin": (
        "SELECT n_name, COUNT(*) FROM customer, nation "
        "WHERE c_nationkey = n_nationkey GROUP BY n_name"
    ),
}

expected = {k: canon(sql(q).to_pylist()) for k, q in queries.items()}

db.distribute()
assert db.storage_manager.is_sharded("lineitem")

failures = []
for k, q in queries.items():
    dexec.reset_stats()
    got = canon(sql(q).to_pylist())
    if got != expected[k]:
        failures.append(
            f"{k}: mismatch exp={expected[k][:3]} got={got[:3]}")
    if dexec.STATS["subtrees"] < 1:
        failures.append(f"{k}: nothing lowered onto the global mesh")

if failures:
    print(f"[proc {PROC}] FAIL: " + "; ".join(failures), flush=True)
    sys.exit(1)

print(f"[proc {PROC}] PARITY OK over {jax.device_count()} devices / "
      f"{NPROC} processes", flush=True)

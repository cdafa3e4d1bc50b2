"""Dev loop: run candidate TPC-DS queries against the engine and sqlite.
Usage: python .devloop_tpcds.py <file-with-one-query>  (or edit QUERIES)."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from hyrise_tpu.benchmark.tpcds.generator import TPCDSTableGenerator
from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder

from tests.sqlite_oracle import SQLiteOracle, rows_match
from tests.test_tpch import sqlite_compat

tables = TPCDSTableGenerator(scale_factor=0.003, demo_density=0.05).generate()
db = Database.get()
oracle = SQLiteOracle()
for name, t in tables.items():
    db.storage_manager.add_table(name, t)
    oracle.load_table(name, t)

sql_text = open(sys.argv[1]).read()
theirs = oracle.execute(sqlite_compat(sql_text))
print(f"sqlite: {len(theirs)} rows; first: {theirs[:3]}")
ours = SQLPipelineBuilder(sql_text).create_pipeline().get_result_table().to_pylist()
print(f"ours  : {len(ours)} rows; first: {ours[:3]}")
ok = rows_match(ours, theirs, ordered=False)
print("MATCH" if ok else "MISMATCH")
if not ok:
    so = sorted(map(tuple, ours), key=repr)
    st = sorted(map(tuple, theirs), key=repr)
    for a, b in list(zip(so, st))[:10]:
        if a != b:
            print("ours  :", a)
            print("sqlite:", b)

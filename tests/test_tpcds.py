"""TPC-DS store-channel differential test vs sqlite at tiny scale."""

import pytest

from hyrise_tpu.benchmark.tpcds.generator import TPCDSTableGenerator
from hyrise_tpu.benchmark.tpcds.queries import TPCDS_QUERIES
from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder

from tests.sqlite_oracle import SQLiteOracle, rows_match
from tests.test_tpch import sqlite_compat

_GENERATED = {}


@pytest.fixture
def tpcds_env():
    sf = 0.003
    if sf not in _GENERATED:
        _GENERATED[sf] = TPCDSTableGenerator(
            scale_factor=sf, demo_density=0.05
        ).generate()
    db = Database.get()
    oracle = SQLiteOracle()
    for name, t in _GENERATED[sf].items():
        db.storage_manager.add_table(name, t)
        oracle.load_table(name, t)
    return oracle


@pytest.mark.parametrize("qid", sorted(TPCDS_QUERIES))
def test_tpcds_query(tpcds_env, qid):
    sql = TPCDS_QUERIES[qid]
    ours = SQLPipelineBuilder(sql).create_pipeline().get_result_table().to_pylist()
    theirs = tpcds_env.execute(sqlite_compat(sql))
    assert rows_match(ours, theirs, ordered=False), (
        f"TPC-DS {qid}: ours={len(ours)} sqlite={len(theirs)}\n"
        f"{ours[:5]}\n{theirs[:5]}"
    )

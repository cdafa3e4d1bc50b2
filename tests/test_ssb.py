"""SSB 13-query differential test vs sqlite at tiny scale."""

import pytest

from hyrise_tpu.benchmark.ssb.generator import SSBTableGenerator
from hyrise_tpu.benchmark.ssb.queries import SSB_QUERIES
from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder

from tests.sqlite_oracle import SQLiteOracle, rows_match

_GENERATED = {}


@pytest.fixture
def ssb_env():
    sf = 0.002
    if sf not in _GENERATED:
        _GENERATED[sf] = SSBTableGenerator(scale_factor=sf).generate()
    db = Database.get()
    oracle = SQLiteOracle()
    for name, t in _GENERATED[sf].items():
        db.storage_manager.add_table(name, t)
        oracle.load_table(name, t)
    return oracle


@pytest.mark.parametrize("qid", sorted(SSB_QUERIES))
def test_ssb_query(ssb_env, qid):
    sql = SSB_QUERIES[qid]
    ours = SQLPipelineBuilder(sql).create_pipeline().get_result_table().to_pylist()
    theirs = ssb_env.execute(sql)
    assert rows_match(ours, theirs, ordered=False), (
        f"SSB {qid}: ours={len(ours)} sqlite={len(theirs)}\n"
        f"{ours[:5]}\n{theirs[:5]}"
    )

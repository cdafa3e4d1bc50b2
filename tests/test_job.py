"""Join Order Benchmark differential tests: every JOB query family runs
against the synthetic IMDB schema (same 21-table join graph as the real
dataset — ref: benchmark/join_order_benchmark.cpp) and must match sqlite.
These are the deepest join chains in the suite (up to 14-way)."""

import pytest

from hyrise_tpu.benchmark.job.generator import IMDBTableGenerator
from hyrise_tpu.benchmark.job.queries import JOB_QUERIES
from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder

from tests.sqlite_oracle import SQLiteOracle, rows_match

_GENERATED = {}


@pytest.fixture
def job_env():
    if not _GENERATED:
        _GENERATED.update(IMDBTableGenerator(scale_factor=0.004).generate())
    db = Database.get()
    oracle = SQLiteOracle()
    for name, t in _GENERATED.items():
        db.storage_manager.add_table(name, t)
        oracle.load_table(name, t)
    return oracle


@pytest.mark.parametrize("qid", sorted(JOB_QUERIES))
def test_job_query(job_env, qid):
    sql = JOB_QUERIES[qid]
    ours = SQLPipelineBuilder(sql).create_pipeline().get_result_table().to_pylist()
    theirs = job_env.execute(sql)
    assert rows_match(ours, theirs, ordered=False), (
        f"JOB {qid}: ours={ours[:2]} sqlite={theirs[:2]}"
    )


def test_job_generator_shape(job_env):
    db = Database.get()
    for name in ("title", "cast_info", "movie_info", "movie_companies",
                 "name", "keyword", "movie_keyword", "char_name",
                 "movie_info_idx", "company_name", "aka_name", "aka_title",
                 "movie_link", "link_type", "kind_type", "role_type",
                 "info_type", "company_type", "comp_cast_type",
                 "complete_cast", "person_info"):
        assert db.storage_manager.has_table(name), name

"""GROUP BY ROLLUP / CUBE / GROUPING SETS (beyond the reference, which
excludes rollup queries — tpcds query_excludelist.cfg).  sqlite has no
ROLLUP either, so the oracle runs the equivalent explicit UNION ALL."""

import pytest

from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
from hyrise_tpu.storage.table import Table
from tests.sqlite_oracle import SQLiteOracle, rows_match


def run_sql(q):
    t = SQLPipelineBuilder(q).create_pipeline().get_result_table()
    return t.to_pylist() if t is not None else None


@pytest.fixture
def env():
    db = Database.reset()
    data = {
        "region": ["e", "e", "w", "w", "w", "n"],
        "prod": ["a", "b", "a", "b", "b", "a"],
        "amt": [10, 20, 30, 40, 50, 5],
        "price": [1.5, 2.5, 0.5, 1.0, 2.0, 3.0],
    }
    t = Table.from_dict(data)
    db.storage_manager.add_table("s", t)
    oracle = SQLiteOracle()
    oracle.load_table("s", t)
    return oracle


def test_rollup_two_keys(env):
    got = run_sql(
        "SELECT region, prod, SUM(amt) FROM s "
        "GROUP BY ROLLUP(region, prod) ORDER BY region, prod"
    )
    exp = env.execute(
        "SELECT region, prod, SUM(amt) FROM s GROUP BY region, prod "
        "UNION ALL SELECT region, NULL, SUM(amt) FROM s GROUP BY region "
        "UNION ALL SELECT NULL, NULL, SUM(amt) FROM s "
        "ORDER BY region, prod"
    )
    assert rows_match(got, exp, ordered=True)


def test_cube_two_keys(env):
    got = run_sql(
        "SELECT region, prod, SUM(amt), COUNT(*) FROM s "
        "GROUP BY CUBE(region, prod) ORDER BY region, prod"
    )
    exp = env.execute(
        "SELECT region, prod, SUM(amt), COUNT(*) FROM s GROUP BY region, prod"
        " UNION ALL SELECT region, NULL, SUM(amt), COUNT(*) FROM s GROUP BY region"
        " UNION ALL SELECT NULL, prod, SUM(amt), COUNT(*) FROM s GROUP BY prod"
        " UNION ALL SELECT NULL, NULL, SUM(amt), COUNT(*) FROM s"
        " ORDER BY region, prod"
    )
    assert rows_match(got, exp, ordered=True)


def test_grouping_sets_explicit(env):
    got = run_sql(
        "SELECT region, prod, AVG(price) FROM s "
        "GROUP BY GROUPING SETS ((region, prod), (prod), ()) "
        "ORDER BY region, prod"
    )
    exp = env.execute(
        "SELECT region, prod, AVG(price) FROM s GROUP BY region, prod"
        " UNION ALL SELECT NULL, prod, AVG(price) FROM s GROUP BY prod"
        " UNION ALL SELECT NULL, NULL, AVG(price) FROM s"
        " ORDER BY region, prod"
    )
    assert rows_match(got, exp, ordered=True)


def test_rollup_with_having_and_where(env):
    got = run_sql(
        "SELECT region, SUM(amt) FROM s WHERE amt > 5 "
        "GROUP BY ROLLUP(region) HAVING SUM(amt) > 25 ORDER BY region"
    )
    exp = env.execute(
        "SELECT region, SUM(amt) FROM s WHERE amt > 5 GROUP BY region "
        "HAVING SUM(amt) > 25 "
        "UNION ALL SELECT NULL, SUM(amt) FROM s WHERE amt > 5 "
        "HAVING SUM(amt) > 25 ORDER BY region"
    )
    assert rows_match(got, exp, ordered=True)


def test_rollup_numeric_key(env):
    got = run_sql(
        "SELECT amt, COUNT(*) FROM s GROUP BY ROLLUP(amt) ORDER BY amt"
    )
    exp = env.execute(
        "SELECT amt, COUNT(*) FROM s GROUP BY amt "
        "UNION ALL SELECT NULL, COUNT(*) FROM s ORDER BY amt"
    )
    assert rows_match(got, exp, ordered=True)


def test_grouping_function(env):
    # GROUPING() folds per branch; ORDER BY references it via its alias
    # (the sort runs above the union, where the constant no longer exists)
    got = run_sql(
        "SELECT region, GROUPING(region) AS gr, SUM(amt) FROM s "
        "GROUP BY ROLLUP(region) ORDER BY gr, region"
    )
    exp = env.execute(
        "SELECT region, 0, SUM(amt) FROM s GROUP BY region "
        "UNION ALL SELECT NULL, 1, SUM(amt) FROM s ORDER BY 2, region"
    )
    assert rows_match(got, exp, ordered=True)


def test_grouping_in_having(env):
    # keep only the subtotal rows
    got = run_sql(
        "SELECT region, prod, SUM(amt) FROM s "
        "GROUP BY ROLLUP(region, prod) HAVING GROUPING(prod) = 1 "
        "ORDER BY region, prod"
    )
    exp = env.execute(
        "SELECT region, NULL, SUM(amt) FROM s GROUP BY region "
        "UNION ALL SELECT NULL, NULL, SUM(amt) FROM s ORDER BY region"
    )
    assert rows_match(got, exp, ordered=True)

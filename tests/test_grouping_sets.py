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


def test_rollup_window_requires_grouping_partition(env):
    """A window that does not partition by the grouping level would rank
    across grouping sets — rejected loudly, not silently wrong."""
    with pytest.raises(Exception, match="PARTITION BY the grouping"):
        run_sql(
            "SELECT region, SUM(amt) AS s, RANK() OVER (ORDER BY SUM(amt)) "
            "FROM s GROUP BY ROLLUP(region)"
        )


def test_rollup_window_with_grouping_partition(env):
    got = run_sql(
        "SELECT region, SUM(amt) AS s, GROUPING(region) AS gr, "
        "RANK() OVER (PARTITION BY GROUPING(region) ORDER BY SUM(amt) DESC)"
        " AS rk FROM s GROUP BY ROLLUP(region) ORDER BY gr, rk"
    )
    exp = env.execute(
        "SELECT region, s, gr, RANK() OVER (PARTITION BY gr ORDER BY s "
        "DESC) AS rk FROM (SELECT region, SUM(amt) AS s, 0 AS gr FROM s "
        "GROUP BY region UNION ALL SELECT NULL, SUM(amt), 1 FROM s) u "
        "ORDER BY gr, rk"
    )
    assert rows_match(got, exp, ordered=True)


def test_rollup_qualified_key_vs_bare_select(env):
    got = run_sql(
        "SELECT region, SUM(amt) FROM s GROUP BY ROLLUP(s.region) "
        "ORDER BY region"
    )
    exp = env.execute(
        "SELECT region, SUM(amt) FROM s GROUP BY region "
        "UNION ALL SELECT NULL, SUM(amt) FROM s ORDER BY region"
    )
    assert rows_match(got, exp, ordered=True)


def test_grouping_sets_expression_key(env):
    got = run_sql(
        "SELECT region || prod, SUM(amt) FROM s "
        "GROUP BY GROUPING SETS ((region || prod), ()) ORDER BY 1"
    )
    exp = env.execute(
        "SELECT region || prod, SUM(amt) FROM s GROUP BY region || prod "
        "UNION ALL SELECT NULL, SUM(amt) FROM s ORDER BY 1"
    )
    assert rows_match(got, exp, ordered=True)


def test_grouping_under_plain_group_by(env):
    got = run_sql(
        "SELECT region, GROUPING(region), SUM(amt) FROM s GROUP BY region "
        "ORDER BY region"
    )
    exp = env.execute(
        "SELECT region, 0, SUM(amt) FROM s GROUP BY region ORDER BY region"
    )
    assert rows_match(got, exp, ordered=True)


def test_window_over_encoded_table(env):
    """Window queries over bulk-encoded (packed/RLE) base tables must
    decode at the eager operator entry."""
    from hyrise_tpu.database import Database
    from hyrise_tpu.storage.table import Table

    db = Database.get()
    n = 2048
    t = Table.from_dict({
        "g": [i % 4 for i in range(n)],
        # sorted float column -> RLE; small ints -> packed
        "x": [float(i // 256) for i in range(n)],
    })
    assert t.encode_packed() >= 1
    db.storage_manager.add_table("enc", t)
    rows = run_sql(
        "SELECT g, LAG(x) OVER (PARTITION BY g ORDER BY x), "
        "SUM(x) OVER (PARTITION BY g) FROM enc ORDER BY g LIMIT 5"
    )
    assert len(rows) == 5
    # union over encoded tables exercises concat/setop decode
    rows2 = run_sql("SELECT g FROM enc INTERSECT SELECT g FROM enc")
    assert len(rows2) == 4

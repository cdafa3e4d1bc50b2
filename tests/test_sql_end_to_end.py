"""End-to-end SQL tests with sqlite differential checking
(ref model: sqlite_testrunner over sqlite_testrunner_queries.sql)."""

import pytest

from tests.sqlite_oracle import make_env, check_query


@pytest.fixture
def env():
    return make_env(
        {
            "t": {
                "a": [1, 2, 3, 4, 5, 6],
                "b": [10.5, 20.25, 30.0, 40.75, 50.5, 60.0],
                "s": ["apple", "banana", "apple", "cherry", "banana", "apple"],
                "n": [1, None, 3, None, 5, 6],
            },
            "u": {
                "id": [1, 2, 3, 9],
                "tag": ["x", "y", "z", "w"],
            },
        }
    )


def test_select_star(env):
    check_query(env, "SELECT * FROM t")


def test_projection_arithmetic(env):
    check_query(env, "SELECT a + 1, b * 2, a * b FROM t")


def test_where_simple(env):
    check_query(env, "SELECT a, s FROM t WHERE a > 2")
    check_query(env, "SELECT a FROM t WHERE b >= 30.0 AND a < 6")
    check_query(env, "SELECT a FROM t WHERE s = 'apple' OR s = 'cherry'")
    check_query(env, "SELECT a FROM t WHERE s <> 'apple'")
    check_query(env, "SELECT a FROM t WHERE a BETWEEN 2 AND 4")
    check_query(env, "SELECT a FROM t WHERE s LIKE 'a%'")
    check_query(env, "SELECT a FROM t WHERE s NOT LIKE '%an%'")
    check_query(env, "SELECT a FROM t WHERE n IS NULL")
    check_query(env, "SELECT a FROM t WHERE n IS NOT NULL")
    check_query(env, "SELECT a FROM t WHERE a IN (1, 3, 5)")
    check_query(env, "SELECT a FROM t WHERE a NOT IN (1, 3, 5)")


def test_case_expr(env):
    check_query(
        env,
        "SELECT a, CASE WHEN a < 3 THEN 'small' WHEN a < 5 THEN 'mid' "
        "ELSE 'big' END FROM t",
    )


def test_order_by(env):
    check_query(env, "SELECT a, b FROM t ORDER BY b DESC")
    check_query(env, "SELECT s, a FROM t ORDER BY s ASC, a DESC")
    check_query(env, "SELECT n FROM t ORDER BY n")
    check_query(env, "SELECT a FROM t ORDER BY a LIMIT 3")
    check_query(env, "SELECT a FROM t ORDER BY a DESC LIMIT 2")


def test_distinct(env):
    check_query(env, "SELECT DISTINCT s FROM t")
    check_query(env, "SELECT DISTINCT s, a > 3 FROM t")


def test_aggregates_global(env):
    check_query(env, "SELECT COUNT(*), COUNT(n), SUM(a), MIN(b), MAX(b) FROM t")
    check_query(env, "SELECT AVG(a), SUM(b) FROM t")
    check_query(env, "SELECT COUNT(DISTINCT s) FROM t")


def test_aggregates_grouped(env):
    check_query(env, "SELECT s, COUNT(*), SUM(a) FROM t GROUP BY s")
    check_query(env, "SELECT s, AVG(b) FROM t GROUP BY s ORDER BY s")
    check_query(env, "SELECT s, SUM(a) FROM t GROUP BY s HAVING SUM(a) > 5")
    check_query(env, "SELECT s, COUNT(n) FROM t GROUP BY s")


def test_group_by_expression(env):
    check_query(env, "SELECT a % 2, COUNT(*) FROM t GROUP BY a % 2")


def test_joins(env):
    check_query(env, "SELECT t.a, u.tag FROM t JOIN u ON t.a = u.id")
    check_query(env, "SELECT t.a, u.tag FROM t LEFT JOIN u ON t.a = u.id")
    check_query(
        env, "SELECT t.a, u.tag FROM t JOIN u ON t.a = u.id WHERE u.tag <> 'x'"
    )
    check_query(env, "SELECT t.a, u.id FROM t, u WHERE t.a = u.id")
    check_query(env, "SELECT t.a, u.id FROM t CROSS JOIN u")
    check_query(env, "SELECT t.a, u.id FROM t JOIN u ON t.a < u.id")


def test_join_aliases(env):
    check_query(
        env,
        "SELECT x.a, y.a FROM t x JOIN t y ON x.a = y.a WHERE x.a < 3",
    )


def test_subqueries_uncorrelated(env):
    check_query(env, "SELECT a FROM t WHERE a IN (SELECT id FROM u)")
    check_query(env, "SELECT a FROM t WHERE a NOT IN (SELECT id FROM u)")
    check_query(env, "SELECT a FROM t WHERE a > (SELECT MIN(id) FROM u)")
    check_query(env, "SELECT a, (SELECT MAX(id) FROM u) FROM t")


def test_subqueries_correlated(env):
    check_query(
        env,
        "SELECT a FROM t WHERE EXISTS (SELECT 1 FROM u WHERE u.id = t.a)",
    )
    check_query(
        env,
        "SELECT a FROM t WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.id = t.a)",
    )


def test_derived_table(env):
    check_query(
        env,
        "SELECT q.s, q.total FROM (SELECT s, SUM(a) AS total FROM t GROUP BY s) q "
        "WHERE q.total > 5",
    )


def test_with_cte(env):
    check_query(
        env,
        "WITH big AS (SELECT a, s FROM t WHERE a > 2) "
        "SELECT s, COUNT(*) FROM big GROUP BY s",
    )


def test_set_operations(env):
    check_query(env, "SELECT a FROM t WHERE a < 4 UNION SELECT id FROM u")
    check_query(env, "SELECT a FROM t WHERE a < 4 UNION ALL SELECT id FROM u")
    check_query(env, "SELECT a FROM t INTERSECT SELECT id FROM u")
    check_query(env, "SELECT a FROM t EXCEPT SELECT id FROM u")


def test_string_functions(env):
    check_query(env, "SELECT UPPER(s), LENGTH(s) FROM t")
    check_query(env, "SELECT SUBSTR(s, 1, 3) FROM t")


def test_order_by_alias_and_position(env):
    check_query(env, "SELECT a AS x FROM t ORDER BY x DESC")
    check_query(env, "SELECT a, b FROM t ORDER BY 2 DESC")


def test_limit_offset(env):
    check_query(env, "SELECT a FROM t ORDER BY a LIMIT 2 OFFSET 2")


def test_null_arithmetic(env):
    check_query(env, "SELECT n + 1 FROM t")
    check_query(env, "SELECT COALESCE(n, 0) FROM t")


def test_having_without_groupby_column_in_select(env):
    check_query(env, "SELECT SUM(a) FROM t GROUP BY s HAVING COUNT(*) > 1")

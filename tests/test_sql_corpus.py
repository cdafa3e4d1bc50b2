"""Systematic SQL corpus differential test (ref:
sqlite_testrunner.hpp:39 runs every query in sqlite_testrunner_queries.sql
against both engines; ours GENERATES the corpus combinatorially over
predicates x joins x aggregates x orderings x null handling)."""

import pytest

from tests.sqlite_oracle import make_env, check_query


@pytest.fixture(scope="module")
def corpus_tables():
    return {
        "a": {
            "id": list(range(1, 21)),
            "grp": [i % 4 for i in range(20)],
            "val": [i * 1.5 - 10 for i in range(20)],
            "txt": [f"w{i % 7}" for i in range(20)],
            "nul": [i if i % 3 else None for i in range(20)],
        },
        "b": {
            "id": [2, 4, 6, 8, 10, 12, 25],
            "tag": ["x", "y", "x", "z", "y", "x", "q"],
            "w": [1.25, None, 3.5, 4.0, None, 6.75, 7.0],
        },
    }


@pytest.fixture
def env(corpus_tables):
    return make_env(corpus_tables)


PREDICATES = [
    "id > 10",
    "id <= 5 OR id >= 18",
    "grp = 2 AND val < 5",
    "val BETWEEN -5 AND 5",
    "txt IN ('w1', 'w3', 'w5')",
    "txt LIKE 'w1%'",
    "nul IS NULL",
    "nul IS NOT NULL AND nul > 5",
    "NOT (grp = 0)",
    "id % 2 = 0",
]


@pytest.mark.parametrize("pred", PREDICATES)
def test_corpus_filters(env, pred):
    check_query(env, f"SELECT id, grp, val FROM a WHERE {pred}")
    check_query(env, f"SELECT COUNT(*) FROM a WHERE {pred}")


AGG_SHAPES = [
    "SELECT grp, COUNT(*), SUM(val), MIN(val), MAX(val) FROM a GROUP BY grp",
    "SELECT grp, AVG(val) FROM a GROUP BY grp HAVING COUNT(*) > 4",
    "SELECT txt, COUNT(DISTINCT grp) FROM a GROUP BY txt",
    "SELECT grp, COUNT(nul), SUM(nul) FROM a GROUP BY grp",
    "SELECT COUNT(*), COUNT(nul), SUM(nul), AVG(nul) FROM a",
    "SELECT grp, txt, SUM(id) FROM a GROUP BY grp, txt",
    "SELECT grp + 1, SUM(val * 2) FROM a GROUP BY grp + 1",
]


@pytest.mark.parametrize("q", AGG_SHAPES)
def test_corpus_aggregates(env, q):
    check_query(env, q)


JOIN_SHAPES = [
    "SELECT a.id, b.tag FROM a JOIN b ON a.id = b.id",
    "SELECT a.id, b.tag FROM a LEFT JOIN b ON a.id = b.id",
    "SELECT a.id, b.tag, b.w FROM a JOIN b ON a.id = b.id WHERE b.w > 2",
    "SELECT a.grp, COUNT(b.id) FROM a LEFT JOIN b ON a.id = b.id GROUP BY a.grp",
    "SELECT a.id FROM a WHERE a.id IN (SELECT id FROM b)",
    "SELECT a.id FROM a WHERE a.id NOT IN (SELECT id FROM b WHERE w IS NOT NULL)",
    "SELECT a.id FROM a WHERE EXISTS (SELECT 1 FROM b WHERE b.id = a.id)",
    "SELECT a.id, b.id FROM a JOIN b ON a.id < b.id WHERE b.id < 7",
    "SELECT x.id, y.id FROM a x JOIN a y ON x.grp = y.grp WHERE x.id < 3 AND y.id > 17",
]


@pytest.mark.parametrize("q", JOIN_SHAPES)
def test_corpus_joins(env, q):
    check_query(env, q)


ORDER_SHAPES = [
    "SELECT id, val FROM a ORDER BY val DESC LIMIT 5",
    "SELECT nul FROM a ORDER BY nul",
    "SELECT nul FROM a ORDER BY nul DESC",
    "SELECT grp, val FROM a ORDER BY grp ASC, val DESC",
    "SELECT DISTINCT grp FROM a ORDER BY grp",
    "SELECT txt FROM a ORDER BY txt LIMIT 3 OFFSET 2",
]


@pytest.mark.parametrize("q", ORDER_SHAPES)
def test_corpus_ordering(env, q):
    check_query(env, q)


EXPR_SHAPES = [
    "SELECT id, CASE WHEN val < 0 THEN 'neg' WHEN val = 0 THEN 'zero' ELSE 'pos' END FROM a",
    "SELECT id, COALESCE(nul, -1) FROM a",
    "SELECT id, val + nul FROM a",
    "SELECT UPPER(txt), LENGTH(txt) FROM a",
    "SELECT id, CAST(val AS INTEGER) FROM a WHERE val >= 0",
    "SELECT SUBSTR(txt, 1, 1), COUNT(*) FROM a GROUP BY SUBSTR(txt, 1, 1)",
    "SELECT id * 2 + grp, -val FROM a WHERE id < 5",
]


@pytest.mark.parametrize("q", EXPR_SHAPES)
def test_corpus_expressions(env, q):
    check_query(env, q)


SETOP_SHAPES = [
    "SELECT id FROM a WHERE id < 8 UNION SELECT id FROM b",
    "SELECT id FROM a WHERE id < 8 UNION ALL SELECT id FROM b",
    "SELECT id FROM a INTERSECT SELECT id FROM b",
    "SELECT id FROM a EXCEPT SELECT id FROM b",
    "SELECT grp FROM a UNION SELECT id FROM b WHERE id < 5",
]


@pytest.mark.parametrize("q", SETOP_SHAPES)
def test_corpus_set_ops(env, q):
    check_query(env, q)


NESTED_SHAPES = [
    "SELECT t.g, t.s FROM (SELECT grp AS g, SUM(val) AS s FROM a GROUP BY grp) t WHERE t.s > 0",
    "WITH c AS (SELECT id, grp FROM a WHERE id > 5) SELECT grp, COUNT(*) FROM c GROUP BY grp",
    "SELECT id FROM a WHERE val > (SELECT AVG(val) FROM a)",
    "SELECT (SELECT MAX(id) FROM b), COUNT(*) FROM a",
    "SELECT grp, SUM(val) FROM a GROUP BY grp HAVING SUM(val) > (SELECT AVG(val) FROM a)",
]


@pytest.mark.parametrize("q", NESTED_SHAPES)
def test_corpus_nested(env, q):
    check_query(env, q)


# ---- round-2 expansion: deeper nesting, correlation, outer joins with
# filters, distinct aggregates, boolean algebra, string functions, and
# mixed set operations (ref: the reference's corpus has hundreds of
# shapes in sqlite_testrunner_queries.sql)

CORRELATED_SHAPES = [
    "SELECT id FROM a WHERE val > (SELECT AVG(val) FROM a a2 WHERE a2.grp = a.grp)",
    "SELECT id FROM a WHERE EXISTS (SELECT * FROM b WHERE b.id = a.id AND b.w > 2)",
    "SELECT id FROM a WHERE NOT EXISTS (SELECT * FROM b WHERE b.id = a.id)",
    "SELECT id FROM a WHERE EXISTS (SELECT * FROM b WHERE b.id = a.id) "
    "OR EXISTS (SELECT * FROM b WHERE b.id = a.id + 1)",
    "SELECT grp, (SELECT COUNT(*) FROM b) FROM a GROUP BY grp",
    "SELECT id FROM b WHERE w > (SELECT MIN(val) FROM a WHERE a.grp = 1)",
]


@pytest.mark.parametrize("q", CORRELATED_SHAPES)
def test_corpus_correlated(env, q):
    check_query(env, q)


OUTER_SHAPES = [
    "SELECT a.id, b.w FROM a LEFT JOIN b ON a.id = b.id WHERE b.w IS NULL",
    "SELECT a.id, b.w FROM a LEFT JOIN b ON a.id = b.id AND b.w > 3",
    "SELECT a.id, b.id FROM a RIGHT JOIN b ON a.id = b.id",
    "SELECT a.id, b.id FROM a FULL OUTER JOIN b ON a.id = b.id",
    "SELECT COUNT(b.id), COUNT(*) FROM a LEFT JOIN b ON a.id = b.id",
    "SELECT a.grp, SUM(b.w) FROM a LEFT JOIN b ON a.id = b.id GROUP BY a.grp",
    "SELECT a.id, b.tag FROM a CROSS JOIN b WHERE a.id = 1",
    "SELECT t1.id FROM a t1 JOIN a t2 ON t1.id = t2.id + 1 "
    "JOIN a t3 ON t2.id = t3.id + 1 WHERE t3.grp = 0",
]


@pytest.mark.parametrize("q", OUTER_SHAPES)
def test_corpus_outer_joins(env, q):
    check_query(env, q)


DISTINCT_SHAPES = [
    "SELECT COUNT(DISTINCT grp), COUNT(DISTINCT txt) FROM a",
    "SELECT SUM(DISTINCT grp) FROM a",
    "SELECT AVG(DISTINCT grp) FROM a",
    "SELECT grp, COUNT(DISTINCT nul) FROM a GROUP BY grp",
    "SELECT DISTINCT grp, txt FROM a WHERE id < 10",
    "SELECT DISTINCT nul FROM a",
]


@pytest.mark.parametrize("q", DISTINCT_SHAPES)
def test_corpus_distinct(env, q):
    check_query(env, q)


BOOLEAN_SHAPES = [
    "SELECT id FROM a WHERE (grp = 1 OR grp = 2) AND NOT (val > 5)",
    "SELECT id FROM a WHERE nul > 5 OR nul IS NULL",
    "SELECT id FROM a WHERE NOT (nul > 5)",
    "SELECT id, val > 0 FROM a WHERE id < 6",
    "SELECT id FROM a WHERE (val > 0) = (grp > 1)",
    "SELECT id FROM a WHERE txt BETWEEN 'w1' AND 'w4'",
    "SELECT id FROM a WHERE txt NOT LIKE 'w%'",
    "SELECT id FROM a WHERE nul IN (3, 6, NULL)",
]


@pytest.mark.parametrize("q", BOOLEAN_SHAPES)
def test_corpus_boolean(env, q):
    check_query(env, q)


STRING_SHAPES = [
    "SELECT LOWER(txt), UPPER(txt) FROM a WHERE id <= 3",
    "SELECT txt || '_' || txt FROM a WHERE id <= 3",
    "SELECT id FROM a WHERE LENGTH(txt) = 2",
    "SELECT SUBSTR(txt, 2) FROM a WHERE id < 4",
    "SELECT MIN(txt), MAX(txt) FROM a",
    "SELECT grp, MIN(txt) FROM a GROUP BY grp",
    "SELECT TRIM('  pad  ') FROM a LIMIT 1",
]


@pytest.mark.parametrize("q", STRING_SHAPES)
def test_corpus_strings(env, q):
    check_query(env, q)


DEEP_SHAPES = [
    "SELECT g, c FROM (SELECT grp AS g, COUNT(*) AS c FROM "
    "(SELECT grp FROM a WHERE val > -5) s GROUP BY grp) t WHERE c > 2",
    "WITH x AS (SELECT grp, SUM(val) AS s FROM a GROUP BY grp), "
    "y AS (SELECT grp, COUNT(*) AS c FROM a GROUP BY grp) "
    "SELECT x.grp, x.s, y.c FROM x JOIN y ON x.grp = y.grp",
    "SELECT (SELECT COUNT(*) FROM a WHERE val > 0) - "
    "(SELECT COUNT(*) FROM a WHERE val < 0) FROM b LIMIT 1",
    "SELECT grp, SUM(val) FROM a WHERE id IN "
    "(SELECT id FROM a WHERE txt LIKE 'w%') GROUP BY grp "
    "HAVING SUM(val) <> 0",
    "SELECT u.id FROM (SELECT id FROM a UNION SELECT id FROM b) u "
    "WHERE u.id % 3 = 0",
    "SELECT a.grp, m.mx FROM a JOIN (SELECT grp, MAX(val) AS mx FROM a "
    "GROUP BY grp) m ON a.grp = m.grp WHERE a.val = m.mx",
]


@pytest.mark.parametrize("q", DEEP_SHAPES)
def test_corpus_deep_nesting(env, q):
    check_query(env, q)


ARITH_SHAPES = [
    "SELECT id, val / 2, val * val FROM a WHERE id < 5",
    "SELECT id % 7, COUNT(*) FROM a GROUP BY id % 7",
    "SELECT -id, ABS(val) FROM a WHERE val < 0",
    "SELECT id, ROUND(val, 0) FROM a WHERE id < 6",
    "SELECT SUM(val) / COUNT(*), AVG(val) FROM a",
    "SELECT MAX(val) - MIN(val) FROM a GROUP BY grp",
    "SELECT id FROM a WHERE val * 2 BETWEEN id - 10 AND id + 10",
]


@pytest.mark.parametrize("q", ARITH_SHAPES)
def test_corpus_arithmetic(env, q):
    check_query(env, q)


# windows: verified vs sqlite's window implementation (sqlite 3.25+);
# the reference cannot execute ANY of these (lqp_translator.cpp:523)
WINDOW_SHAPES = [
    "SELECT id, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY id) FROM a "
    "ORDER BY id",
    "SELECT id, RANK() OVER (ORDER BY grp) FROM a ORDER BY id",
    "SELECT id, SUM(val) OVER (PARTITION BY grp ORDER BY id) FROM a "
    "ORDER BY id",
    "SELECT id, LAG(val) OVER (PARTITION BY grp ORDER BY id) FROM a "
    "ORDER BY id",
    "SELECT id, LEAD(id, 2, -1) OVER (ORDER BY id) FROM a ORDER BY id",
    "SELECT id, FIRST_VALUE(txt) OVER (PARTITION BY grp ORDER BY id) "
    "FROM a ORDER BY id",
    "SELECT id, NTILE(3) OVER (ORDER BY id) FROM a ORDER BY id",
]


@pytest.mark.parametrize("q", WINDOW_SHAPES)
def test_corpus_windows(env, q):
    check_query(env, q)

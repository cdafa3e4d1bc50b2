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

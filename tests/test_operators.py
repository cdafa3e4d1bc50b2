"""Operator tests (ref model: test/lib/operators/*_test.cpp)."""

import numpy as np
import pytest

from hyrise_tpu.expression import ast
from hyrise_tpu.operators import (
    Aggregate,
    AliasOperator,
    Difference,
    Intersect,
    Join,
    Limit,
    Product,
    Projection,
    Sort,
    TableScan,
    TableWrapper,
    UnionAll,
    UnionUnique,
)
from hyrise_tpu.operators.joins import JoinPredicate
from hyrise_tpu.operators.set_ops import Distinct
from hyrise_tpu.storage import Table
from hyrise_tpu.types import (
    AggregateFunction,
    DataType,
    JoinMode,
    PredicateCondition,
    SortMode,
)


def wrap(data, types=None):
    op = TableWrapper(Table.from_dict(data, types))
    op.execute()
    cols = {e.display_name: e for e in op.output_expressions}
    return op, cols


def run(op):
    op.execute()
    return op.get_output().to_pylist()


def test_table_scan():
    src, c = wrap({"a": [1, 2, 3, 4, 5], "b": [10, 20, 30, 40, 50]})
    scan = TableScan(src, ast.gt(c["a"], ast.lit(2)))
    assert run(scan) == [(3, 30), (4, 40), (5, 50)]


def test_table_scan_conjunction_strings():
    src, c = wrap({"a": [1, 2, 3, 4], "s": ["x", "y", "x", "z"]})
    scan = TableScan(
        src, ast.and_(ast.eq(c["s"], ast.lit("x")), ast.lt(c["a"], ast.lit(3)))
    )
    assert run(scan) == [(1, "x")]


def test_projection():
    src, c = wrap({"a": [1, 2, 3]})
    proj = Projection(src, [c["a"], ast.mul(c["a"], ast.lit(10))], ["a", "a10"])
    out = run(proj)
    assert out == [(1, 10), (2, 20), (3, 30)]


def test_sort_multi():
    src, c = wrap({"a": [2, 1, 2, 1], "b": [1, 2, 3, 4]})
    s = Sort(src, [(c["a"], SortMode.ASC_NULLS_LAST), (c["b"], SortMode.DESC_NULLS_LAST)])
    assert run(s) == [(1, 4), (1, 2), (2, 3), (2, 1)]


def test_limit_offset():
    src, c = wrap({"a": [1, 2, 3, 4, 5]})
    assert run(Limit(src, 2)) == [(1,), (2,)]
    src2, _ = wrap({"a": [1, 2, 3, 4, 5]})
    assert run(Limit(src2, 2, offset=3)) == [(4,), (5,)]


def test_aggregate_grouped():
    src, c = wrap({"g": ["x", "y", "x", "y", "z"], "v": [1, 2, 3, 4, 5]})
    agg = Aggregate(
        src,
        [c["g"]],
        [
            ast.sum_(c["v"]),
            ast.avg(c["v"]),
            ast.min_(c["v"]),
            ast.max_(c["v"]),
            ast.count(c["v"]),
            ast.count(),
        ],
    )
    out = sorted(run(agg))
    assert out == [
        ("x", 4, 2.0, 1, 3, 2, 2),
        ("y", 6, 3.0, 2, 4, 2, 2),
        ("z", 5, 5.0, 5, 5, 1, 1),
    ]


def test_aggregate_global_and_empty():
    src, c = wrap({"v": [1.5, 2.5, None]})
    agg = Aggregate(src, [], [ast.sum_(c["v"]), ast.count(c["v"]), ast.count()])
    assert run(agg) == [(4.0, 2, 3)]
    # empty input: one row, NULL sum, zero counts
    src2, c2 = wrap({"v": [1]})
    scan = TableScan(src2, ast.lt(c2["v"], ast.lit(0)))
    agg2 = Aggregate(scan, [], [ast.sum_(c2["v"]), ast.count(c2["v"])])
    assert run(agg2) == [(None, 0)]


def test_aggregate_count_distinct():
    src, c = wrap({"g": [1, 1, 2, 2, 2], "v": [7, 7, 8, 9, None]})
    agg = Aggregate(src, [c["g"]], [ast.count(c["v"], distinct=True)])
    assert sorted(run(agg)) == [(1, 1), (2, 2)]


def test_aggregate_stddev():
    src, c = wrap({"v": [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]})
    agg = Aggregate(src, [], [ast.AggregateExpression(AggregateFunction.STDDEV_SAMP, c["v"])])
    (row,) = run(agg)
    assert abs(row[0] - 2.13809) < 1e-4


def test_join_inner():
    l, lc = wrap({"id": [1, 2, 3, 4], "lv": [10, 20, 30, 40]})
    r, rc = wrap({"id2": [2, 3, 3, 5], "rv": [200, 300, 301, 500]})
    j = Join(l, r, JoinMode.INNER, [JoinPredicate(lc["id"], rc["id2"])])
    out = sorted(run(j))
    assert out == [(2, 20, 2, 200), (3, 30, 3, 300), (3, 30, 3, 301)]


def test_join_left_outer():
    l, lc = wrap({"id": [1, 2, 3]})
    r, rc = wrap({"id2": [2, 2, 9]})
    j = Join(l, r, JoinMode.LEFT, [JoinPredicate(lc["id"], rc["id2"])])
    out = sorted(run(j), key=lambda t: (t[0], t[1] or 0))
    assert out == [(1, None), (2, 2), (2, 2), (3, None)]


def test_join_right_outer():
    l, lc = wrap({"id": [1, 2]})
    r, rc = wrap({"id2": [2, 9]})
    j = Join(l, r, JoinMode.RIGHT, [JoinPredicate(lc["id"], rc["id2"])])
    out = sorted(run(j), key=lambda t: (t[1],))
    assert out == [(2, 2), (None, 9)]


def test_join_full_outer():
    l, lc = wrap({"id": [1, 2]})
    r, rc = wrap({"id2": [2, 9]})
    j = Join(l, r, JoinMode.FULL, [JoinPredicate(lc["id"], rc["id2"])])
    out = run(j)
    assert sorted(out, key=str) == sorted([(1, None), (2, 2), (None, 9)], key=str)


def test_join_semi_anti():
    l, lc = wrap({"id": [1, 2, 3, None]})
    r, rc = wrap({"id2": [2, 3]})
    semi = Join(l, r, JoinMode.SEMI, [JoinPredicate(lc["id"], rc["id2"])])
    assert sorted(run(semi)) == [(2,), (3,)]
    l2, lc2 = wrap({"id": [1, 2, 3, None]})
    r2, rc2 = wrap({"id2": [2, 3]})
    anti = Join(l2, r2, JoinMode.ANTI_NULL_AS_FALSE,
                [JoinPredicate(lc2["id"], rc2["id2"])])
    out = run(anti)
    assert sorted(out, key=str) == sorted([(1,), (None,)], key=str)
    # NOT IN semantics: null in build side -> empty result
    l3, lc3 = wrap({"id": [1, 2]})
    r3, rc3 = wrap({"id2": [2, None]})
    anti_t = Join(l3, r3, JoinMode.ANTI_NULL_AS_TRUE,
                  [JoinPredicate(lc3["id"], rc3["id2"])])
    assert run(anti_t) == []


def test_join_string_keys_across_dicts():
    l, lc = wrap({"s": ["apple", "fig", "pear"]})
    r, rc = wrap({"s2": ["fig", "grape", "pear"], "v": [1, 2, 3]})
    j = Join(l, r, JoinMode.INNER, [JoinPredicate(lc["s"], rc["s2"])])
    assert sorted(run(j)) == [("fig", "fig", 1), ("pear", "pear", 3)]


def test_join_multi_predicate_packed():
    l, lc = wrap({"a": [1, 1, 2], "b": [10, 20, 10], "v": [1, 2, 3]})
    r, rc = wrap({"a2": [1, 2, 2], "b2": [10, 10, 99], "w": [100, 200, 300]})
    j = Join(
        l, r, JoinMode.INNER,
        [JoinPredicate(lc["a"], rc["a2"]), JoinPredicate(lc["b"], rc["b2"])],
    )
    out = sorted(run(j))
    assert out == [(1, 10, 1, 1, 10, 100), (2, 10, 3, 2, 10, 200)]


def test_join_secondary_non_equi():
    l, lc = wrap({"id": [1, 1, 2], "x": [5, 15, 5]})
    r, rc = wrap({"id2": [1, 2], "lim": [10, 3]})
    j = Join(
        l, r, JoinMode.INNER,
        [JoinPredicate(lc["id"], rc["id2"]),
         JoinPredicate(lc["x"], rc["lim"], PredicateCondition.LESS_THAN)],
    )
    assert sorted(run(j)) == [(1, 5, 1, 10)]


def test_join_non_equi_only():
    l, lc = wrap({"a": [1, 5, 9]})
    r, rc = wrap({"b": [4, 6]})
    j = Join(l, r, JoinMode.INNER,
             [JoinPredicate(lc["a"], rc["b"], PredicateCondition.LESS_THAN)])
    assert sorted(run(j)) == [(1, 4), (1, 6), (5, 6)]


def test_cross_product():
    l, lc = wrap({"a": [1, 2]})
    r, rc = wrap({"b": ["x", "y"]})
    assert sorted(run(Product(l, r))) == [(1, "x"), (1, "y"), (2, "x"), (2, "y")]


def test_union_all_and_unique():
    l, _ = wrap({"a": [1, 2, 2]})
    r, _ = wrap({"a": [2, 3]})
    assert sorted(run(UnionAll(l, r))) == [(1,), (2,), (2,), (2,), (3,)]
    l2, _ = wrap({"a": [1, 2, 2]})
    r2, _ = wrap({"a": [2, 3]})
    assert sorted(run(UnionUnique(l2, r2))) == [(1,), (2,), (3,)]


def test_intersect_difference():
    l, _ = wrap({"a": [1, 2, 2, 3]})
    r, _ = wrap({"a": [2, 4]})
    assert sorted(run(Intersect(l, r))) == [(2,)]
    l2, _ = wrap({"a": [1, 2, 2, 3]})
    r2, _ = wrap({"a": [2, 4]})
    assert sorted(run(Difference(l2, r2))) == [(1,), (3,)]


def test_distinct():
    l, _ = wrap({"a": [1, 2, 2, 1], "b": ["x", "y", "y", "x"]})
    assert sorted(run(Distinct(l))) == [(1, "x"), (2, "y")]


def test_alias():
    l, _ = wrap({"a": [1]})
    out_op = AliasOperator(l, ["renamed"])
    out_op.execute()
    assert out_op.get_output().column_names == ["renamed"]


def test_scan_after_aggregate_having():
    # HAVING = TableScan above Aggregate referencing the aggregate expression
    src, c = wrap({"g": [1, 1, 2, 2], "v": [5, 5, 1, 1]})
    s = ast.sum_(c["v"])
    agg = Aggregate(src, [c["g"]], [s])
    having = TableScan(agg, ast.gt(s, ast.lit(5)))
    assert run(having) == [(1, 10)]


def test_aggregate_keyed_build_is_unique(monkeypatch):
    """Joins whose build side is a GROUP BY on the join key must take the
    sync-free unique-expansion path (group-by keys are a UCC of the
    aggregate output; ref: the FD aggregate_node.cpp derives) — the
    TPC-H Q2/Q15/Q17 correlated-subquery shape."""
    import numpy as np

    from hyrise_tpu.database import Database
    from hyrise_tpu.kernels import joins as joink
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
    from hyrise_tpu.storage.table import Table

    db = Database.reset()
    rng = np.random.default_rng(3)
    n = 4000
    db.storage_manager.add_table("fact", Table.from_dict({
        "k": [int(x) for x in rng.integers(0, 200, n)],
        "v": [float(x) for x in rng.random(n)],
    }))

    def boom(*a, **k):
        raise AssertionError("non-unique expansion used for aggregate build")

    monkeypatch.setattr(joink, "expand_matches", boom)
    rows = (
        SQLPipelineBuilder(
            "SELECT f.k, f.v FROM fact f, "
            "(SELECT k, MAX(v) AS mv FROM fact GROUP BY k) m "
            "WHERE f.k = m.k AND f.v = m.mv"
        ).create_pipeline().get_result_table().to_pylist()
    )
    assert len(rows) >= 200  # one max row per key (ties may add more)


def test_insert_select_positional():
    """INSERT ... SELECT maps source columns POSITIONALLY (SQL), not by
    name: computed select items and reordered columns must land in the
    right target columns."""
    from hyrise_tpu.database import Database
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
    from hyrise_tpu.storage.table import Table

    def run(q):
        t = SQLPipelineBuilder(q).create_pipeline().get_result_table()
        return t.to_pylist() if t is not None else None

    db = Database.reset()
    db.storage_manager.add_table("src", Table.from_dict(
        {"a": [1, 2, 3], "b": [10, 20, 30]}))
    run("CREATE TABLE dst (v INT)")
    run("INSERT INTO dst SELECT a + 100 FROM src")
    assert run("SELECT v FROM dst ORDER BY v") == [(101,), (102,), (103,)]
    run("CREATE TABLE dst2 (x INT, y INT)")
    run("INSERT INTO dst2 SELECT b, a FROM src")  # positional swap
    assert run("SELECT x, y FROM dst2 ORDER BY y") == [
        (10, 1), (20, 2), (30, 3)]

"""Plan-shape + differential tests for BetweenComposition and
JoinToSemiJoin (ref: between_composition_rule_test.cpp,
join_to_semi_join_rule_test.cpp)."""

import pytest

from hyrise_tpu.database import Database
from hyrise_tpu.optimizer import Optimizer
from hyrise_tpu.plan import lqp as L
from hyrise_tpu.sql.parser import parse_sql
from hyrise_tpu.sql.pipeline import sql as run_sql
from hyrise_tpu.sql.translator import SQLTranslator
from hyrise_tpu.storage.table import TableKeyConstraint
from hyrise_tpu.types import JoinMode, PredicateCondition

from tests.sqlite_oracle import make_env, rows_match


def _optimize(sqltext: str) -> L.LQPNode:
    lqp = SQLTranslator().translate(parse_sql(sqltext)[0])
    return Optimizer.create_default_optimizer().optimize(lqp)


@pytest.fixture()
def env():
    oracle = make_env({
        "fact": {
            "k": [1, 2, 2, 3, 4, 4, 4, 9],
            "v": [10.0, 20.0, 21.0, 30.0, 40.0, 41.0, 42.0, 90.0],
        },
        "dim": {
            "k": [1, 2, 3, 4, 5],
            "name": ["a", "b", "c", "d", "e"],
        },
    })
    db = Database.get()
    db.storage_manager.get_table("dim").key_constraints.append(
        TableKeyConstraint(("k",), True)
    )
    return oracle


def _predicates(root):
    return [n for n in root.walk() if isinstance(n, L.PredicateNode)]


def _joins(root):
    return [n for n in root.walk() if isinstance(n, L.JoinNode)]


def test_between_composition_fuses_bounds(env):
    root = _optimize("SELECT v FROM fact WHERE k >= 2 AND k < 4")
    preds = _predicates(root)
    assert len(preds) == 1
    assert preds[0].predicate.condition == \
        PredicateCondition.BETWEEN_UPPER_EXCLUSIVE
    q = "SELECT v FROM fact WHERE k >= 2 AND k < 4"
    assert rows_match(run_sql(q).to_pylist(), env.execute(q), ordered=False)


def test_between_composition_leaves_single_bounds(env):
    root = _optimize("SELECT v FROM fact WHERE k >= 2 AND v < 40.0")
    for p in _predicates(root):
        for e in p.predicate.walk():
            assert getattr(e, "condition", None) not in (
                PredicateCondition.BETWEEN_INCLUSIVE,
                PredicateCondition.BETWEEN_LOWER_EXCLUSIVE,
                PredicateCondition.BETWEEN_UPPER_EXCLUSIVE,
                PredicateCondition.BETWEEN_EXCLUSIVE,
            )


def test_join_to_semi_join_rewrites_filter_join(env):
    q = "SELECT f.v FROM fact f JOIN dim d ON f.k = d.k"
    joins = _joins(_optimize(q))
    assert len(joins) == 1 and joins[0].mode == JoinMode.SEMI
    assert rows_match(run_sql(q).to_pylist(), env.execute(q), ordered=False)


def test_join_to_semi_join_keeps_join_when_right_used(env):
    q = "SELECT f.v, d.name FROM fact f JOIN dim d ON f.k = d.k"
    joins = _joins(_optimize(q))
    assert len(joins) == 1 and joins[0].mode == JoinMode.INNER
    assert rows_match(run_sql(q).to_pylist(), env.execute(q), ordered=False)


def test_join_to_predicate_rewrites_single_row_semi(env):
    # dim filtered by its unique key to one row; dim columns unused above
    # -> the (semi) join becomes a scalar-subquery predicate
    q = "SELECT f.v FROM fact f JOIN dim d ON f.k = d.k WHERE d.k = 2"
    root = _optimize(q)
    assert not _joins(root), "join should be rewritten to a predicate"
    assert rows_match(run_sql(q).to_pylist(), env.execute(q), ordered=False)


def test_join_to_predicate_no_match_returns_empty(env):
    q = "SELECT f.v FROM fact f JOIN dim d ON f.k = d.k WHERE d.k = 77"
    assert not _joins(_optimize(q))
    assert run_sql(q).to_pylist() == []


def test_join_to_semi_join_requires_unique_key(env):
    # fact.k is NOT unique: join against it must stay inner even though
    # no fact columns are used above
    q = "SELECT d.name FROM dim d JOIN fact f ON d.k = f.k"
    joins = _joins(_optimize(q))
    assert len(joins) == 1 and joins[0].mode == JoinMode.INNER
    ours = run_sql(q).to_pylist()
    assert rows_match(ours, env.execute(q), ordered=False)

"""JoinIndex operator tests."""

import pytest

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.operators import GetTable, TableWrapper
from hyrise_tpu.operators.join_index import JoinIndex
from hyrise_tpu.operators.joins import JoinPredicate
from hyrise_tpu.storage import Table
from hyrise_tpu.types import JoinMode


@pytest.fixture
def env():
    db = Database.get()
    db.storage_manager.add_table(
        "dim", Table.from_dict({"k": [1, 2, 3, 5], "name": ["a", "b", "c", "e"]})
    )
    fact = TableWrapper(Table.from_dict({"fk": [2, 2, 3, 9], "v": [10, 20, 30, 40]}))
    fact.execute()
    return fact


def test_join_index_inner(env):
    dim = GetTable("dim")
    pred = JoinPredicate(
        env.output_expressions[0], None  # right expr unused by JoinIndex
    )
    j = JoinIndex(env, dim, JoinMode.INNER, pred, "dim", "k")
    j.execute()
    out = sorted(j.get_output().to_pylist())
    assert out == [(2, 10, 2, "b"), (2, 20, 2, "b"), (3, 30, 3, "c")]


def test_join_index_semi(env):
    dim = GetTable("dim")
    pred = JoinPredicate(env.output_expressions[0], None)
    j = JoinIndex(env, dim, JoinMode.SEMI, pred, "dim", "k")
    j.execute()
    assert sorted(j.get_output().to_pylist()) == [(2, 10), (2, 20), (3, 30)]

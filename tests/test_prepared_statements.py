"""PREPARE/EXECUTE with traced parameter binding (ref: sql/sql_pipeline
PreparedPlan + placeholder binding, storage/prepared_plan.hpp): repeated
executions with new values must reuse the same compiled stage."""

from hyrise_tpu.database import Database
from hyrise_tpu.operators import compiled
from hyrise_tpu.sql.pipeline import sql
from hyrise_tpu.storage.table import Table


def _fresh(name, data):
    db = Database.get()
    if db.storage_manager.has_table(name):
        db.storage_manager.drop_table(name)
    db.storage_manager.add_table(name, Table.from_dict(data))


def test_prepared_select_reuses_stage_cache():
    _fresh("pt", {"k": list(range(100)), "v": [float(i) for i in range(100)]})
    sql("PREPARE sel1 AS SELECT v FROM pt WHERE k = ?")
    assert sql("EXECUTE sel1 (3)").to_pylist() == [(3.0,)]
    n0 = len(compiled._CACHE)
    for val in (7, 11, 42, 99):
        assert sql(f"EXECUTE sel1 ({val})").to_pylist() == [(float(val),)]
    assert len(compiled._CACHE) == n0  # no per-value recompiles


def test_prepared_update_and_insert():
    _fresh("pt2", {"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    sql("PREPARE upd1 AS UPDATE pt2 SET v = ? WHERE k = ?")
    sql("EXECUTE upd1 (10.5, 2)")
    sql("EXECUTE upd1 (30.5, 3)")
    assert sorted(sql("SELECT v FROM pt2").to_pylist()) == [
        (1.0,), (10.5,), (30.5,)
    ]
    sql("PREPARE ins1 AS INSERT INTO pt2 VALUES (?, ?)")
    sql("EXECUTE ins1 (7, 70.5)")
    sql("EXECUTE ins1 (8, 80.5)")
    assert sorted(sql("SELECT k, v FROM pt2 WHERE k >= 7").to_pylist()) == [
        (7, 70.5), (8, 80.5)
    ]


def test_prepared_param_in_expression():
    _fresh("pt3", {"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]})
    sql("PREPARE bump AS UPDATE pt3 SET v = v + ? WHERE k >= ?")
    sql("EXECUTE bump (5.0, 2)")
    assert sorted(sql("SELECT v FROM pt3").to_pylist()) == [
        (10.0,), (25.0,), (35.0,)
    ]


def test_prepared_string_parameter():
    _fresh("pt4", {"name": ["a", "b", "c"], "v": [1.0, 2.0, 3.0]})
    sql("PREPARE byname AS SELECT v FROM pt4 WHERE name = ?")
    assert sql("EXECUTE byname ('b')").to_pylist() == [(2.0,)]
    assert sql("EXECUTE byname ('c')").to_pylist() == [(3.0,)]

"""Unit tests for support components: GDFS cache, date kernels, type
lattice, settings, log manager, cost model."""

import numpy as np
import pytest

from hyrise_tpu.sql.plan_cache import GDFSCache
from hyrise_tpu.types import (
    DataType,
    common_numeric_type,
    padded_size,
    size_bucket,
)
from hyrise_tpu.utils.dates import (
    date_str_to_days,
    days_to_date_str,
    days_to_ymd,
    single_date_to_days,
)


def test_gdfs_cache_eviction_prefers_frequent():
    cache = GDFSCache(capacity=2)
    cache.set("a", 1)
    cache.set("b", 2)
    for _ in range(5):
        assert cache.try_get("a") == 1
    cache.set("c", 3)  # evicts the low-priority 'b'
    assert cache.try_get("a") == 1
    assert cache.try_get("b") is None
    assert cache.try_get("c") == 3


def test_gdfs_inflation_lets_new_entries_in():
    cache = GDFSCache(capacity=2)
    cache.set("hot", 1)
    for _ in range(100):
        cache.try_get("hot")
    cache.set("x", 2)
    cache.set("y", 3)  # evicts x or hot; inflation means y still enters
    assert len(cache) == 2
    assert cache.try_get("y") == 3


def test_date_roundtrip_and_civil():
    days = date_str_to_days(["1970-01-01", "2000-02-29", "1999-12-31"])
    assert days.tolist() == [0, 11016, 10956]
    assert list(days_to_date_str(days)) == [
        "1970-01-01", "2000-02-29", "1999-12-31"
    ]
    y, m, d = days_to_ymd(np.array([11016]))
    assert (y[0], m[0], d[0]) == (2000, 2, 29)
    assert single_date_to_days("1992-01-01") == 8035


def test_device_civil_kernels_match_numpy():
    import jax.numpy as jnp

    from hyrise_tpu.kernels.datetime import civil_from_days, days_from_civil

    days = np.arange(-3650, 20000, 37)
    y, m, d = civil_from_days(jnp.asarray(days))
    ny, nm, nd = days_to_ymd(days)
    assert np.array_equal(np.asarray(y), ny)
    assert np.array_equal(np.asarray(m), nm)
    assert np.array_equal(np.asarray(d), nd)
    back = days_from_civil(y, m, d)
    assert np.array_equal(np.asarray(back), days)


def test_type_lattice():
    assert common_numeric_type(DataType.INT, DataType.LONG) == DataType.LONG
    assert common_numeric_type(DataType.LONG, DataType.FLOAT) == DataType.DOUBLE
    assert common_numeric_type(DataType.INT, DataType.DOUBLE) == DataType.DOUBLE
    assert padded_size(0) == 128
    assert padded_size(129) == 256
    assert size_bucket(1000) == 1024


def test_settings_manager_and_log():
    from hyrise_tpu.database import Database
    from hyrise_tpu.meta.settings_manager import Setting
    from hyrise_tpu.sql.pipeline import sql

    db = Database.get()
    seen = []
    db.settings_manager.register(
        Setting("worker_count", "4", "number of workers", seen.append)
    )
    rows = sql("SELECT name, value FROM meta_settings").to_pylist()
    assert ("worker_count", "4") in rows
    sql("UPDATE meta_settings SET value = '8' WHERE name = 'worker_count'")
    assert db.settings_manager.get_setting("worker_count").get() == "8"
    assert seen == ["8"]
    db.log_manager.add_message("test", "hello world")
    logs = sql("SELECT reporter, message FROM meta_log").to_pylist()
    assert ("test", "hello world") in logs


def test_cost_model_orders_plans_sensibly():
    from hyrise_tpu.database import Database
    from hyrise_tpu.optimizer import Optimizer
    from hyrise_tpu.sql.parser import parse_sql
    from hyrise_tpu.sql.translator import SQLTranslator
    from hyrise_tpu.statistics.cost_model import CostEstimator
    from hyrise_tpu.storage import Table

    db = Database.get()
    db.storage_manager.add_table(
        "big", Table.from_dict({"k": list(range(1000)), "v": [1.0] * 1000})
    )
    opt = Optimizer.create_default_optimizer()

    def cost(sqltext):
        lqp = opt.optimize(SQLTranslator().translate(parse_sql(sqltext)[0]))
        return CostEstimator().estimate_plan_cost(lqp)

    cheap = cost("SELECT k FROM big WHERE k = 5")
    pricey = cost("SELECT a.k FROM big a JOIN big b ON a.k = b.k ORDER BY a.k")
    assert pricey > cheap


def test_scheduler_mode_setting_runs_queries():
    """UPDATE meta_settings switches query execution onto the
    NodeQueueScheduler (per-node queues + work stealing) — results stay
    identical (ref: the reference's --scheduler flag)."""
    from hyrise_tpu.database import Database
    from hyrise_tpu.scheduler.scheduler import NodeQueueScheduler
    from hyrise_tpu.sql.pipeline import sql
    from hyrise_tpu.storage.table import Table

    db = Database.get()
    db.storage_manager.add_table("s1", Table.from_dict(
        {"k": list(range(50)), "g": [i % 5 for i in range(50)]}))
    db.storage_manager.add_table("s2", Table.from_dict(
        {"k2": list(range(0, 50, 2))}))
    q = ("SELECT g, COUNT(*) FROM s1 JOIN s2 ON k = k2 "
         "GROUP BY g ORDER BY g")
    expected = sql(q).to_pylist()
    sql("UPDATE meta_settings SET value = 'node_queue' "
        "WHERE name = 'scheduler.mode'")
    try:
        assert isinstance(db.scheduler, NodeQueueScheduler)
        for _ in range(3):
            assert sql(q).to_pylist() == expected
    finally:
        sql("UPDATE meta_settings SET value = 'immediate' "
            "WHERE name = 'scheduler.mode'")
    assert not isinstance(db.scheduler, NodeQueueScheduler)


def test_explain_statement():
    from hyrise_tpu.database import Database
    from hyrise_tpu.sql.pipeline import sql
    from hyrise_tpu.storage.table import Table

    db = Database.reset()
    db.storage_manager.add_table(
        "t", Table.from_dict({"a": [1, 2, 3], "g": ["x", "y", "x"]}))
    rows = sql(
        "EXPLAIN SELECT g, SUM(a) FROM t WHERE a > 1 GROUP BY g"
    ).to_pylist()
    text = "\n".join(r[0] for r in rows)
    assert "optimized logical plan" in text
    assert "Aggregate" in text and "TableScan" in text
    assert "physical plan" in text


def test_stage_key_scopes_dictionary_identity_to_used_columns():
    """Growth of an UNREFERENCED column's dictionary must not re-key (and
    recompile) a cached stage; growth of a referenced one must."""
    from hyrise_tpu.database import Database
    from hyrise_tpu.operators import compiled
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
    from hyrise_tpu.storage.table import Table

    db = Database.get()
    if db.storage_manager.has_table("skdict"):
        db.storage_manager.drop_table("skdict")
    db.storage_manager.add_table(
        "skdict",
        Table.from_dict({"a": [1, 2, 3], "s": ["x", "y", "z"],
                         "u": ["p", "q", "r"]}),
    )

    def run(q):
        return SQLPipelineBuilder(q).create_pipeline().get_result_table()

    sel = "SELECT a FROM skdict WHERE a > 1"
    assert len(run(sel).to_pylist()) == 2
    before = len(compiled._CACHE)
    # INSERT with a NEW value for u (and s): both dictionaries grow
    run("INSERT INTO skdict VALUES (9, 'zz', 'rr')")
    assert len(run(sel).to_pylist()) == 3
    # the numeric scan references only `a`: its stage key is unchanged, so
    # re-running it after dictionary growth must not mint new executables
    grew = len(compiled._CACHE) - before
    run(sel)
    assert len(compiled._CACHE) - before == grew, (
        "numeric scan re-keyed after unrelated dictionary growth"
    )
    # a scan REFERENCING the grown column must see the new value
    assert len(run("SELECT a FROM skdict WHERE s = 'zz'").to_pylist()) == 1
    db.storage_manager.drop_table("skdict")


def test_table_reserve_preserves_semantics_and_mvcc():
    from hyrise_tpu.database import Database
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder

    db = Database.get()
    if db.storage_manager.has_table("rsv"):
        db.storage_manager.drop_table("rsv")

    def run(q):
        return SQLPipelineBuilder(q).create_pipeline().get_result_table()

    run("CREATE TABLE rsv (a INT, s VARCHAR)")
    run("INSERT INTO rsv VALUES (1, 'x')")
    t = db.storage_manager.get_table("rsv")
    old_cap = t.capacity
    t.reserve(old_cap + 1000)
    assert t.capacity >= old_cap + 1000
    # MVCC arrays grew with the columns: visibility still works
    run("INSERT INTO rsv VALUES (2, 'y')")
    assert run("SELECT a FROM rsv ORDER BY a").to_pylist() == [(1,), (2,)]
    assert t.capacity >= old_cap + 1000  # inserts fit without reshape
    db.storage_manager.drop_table("rsv")


def test_aligned_unique_build_join_is_probe_aligned():
    """Unique-build INNER joins take the row-aligned path: the output is
    the probe table extended by build columns, matches as a selection mask
    (no expansion) — and the rows are still correct."""
    from hyrise_tpu.database import Database
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
    from hyrise_tpu.storage.table import TableKeyConstraint
    from tests.sqlite_oracle import make_env, rows_match

    oracle = make_env({
        "fact": {
            "k": [1, 2, 2, 3, 4, 4, 4, 9],
            "v": [10.0, 20.0, 21.0, 30.0, 40.0, 41.0, 42.0, 90.0],
        },
        "dim": {
            "k": [1, 2, 3, 4, 5],
            "w": [100, 200, 300, 400, 500],
        },
    })
    db = Database.get()
    db.storage_manager.get_table("dim").key_constraints.append(
        TableKeyConstraint(("k",), True)
    )
    q = ("SELECT fact.v, dim.w FROM fact JOIN dim ON fact.k = dim.k "
         "WHERE dim.w < 450")
    pipe = SQLPipelineBuilder(q).create_pipeline()
    out = pipe.get_result_table()
    assert rows_match(out.to_pylist(), oracle.execute(q), ordered=False)
    # find the join operator output in the executed PQP: it must be
    # probe-aligned (selection mask at the probe capacity, not expanded)
    from hyrise_tpu.operators.joins import Join

    root = pipe._pipeline_statements[-1].get_physical_plan()
    joins = [op for op in _walk_pqp(root) if isinstance(op, Join)]
    assert joins, "plan should contain a Join"
    jt = joins[0].get_output()
    fact_cap = db.storage_manager.get_table("fact").capacity
    assert jt.capacity == fact_cap
    assert jt.selection is not None


def _walk_pqp(op, seen=None):
    if seen is None:
        seen = set()
    if id(op) in seen:
        return
    seen.add(id(op))
    yield op
    for child in op.inputs():
        yield from _walk_pqp(child, seen)


def test_semi_join_estimate_uses_ndv_ratio():
    """Semi/anti join cardinality: output ~ left * min(1, ndv_r/ndv_l)
    per equi predicate (statistics/cardinality.py).  The old flat 0.5
    hid 1000x reductions, starving est-based compaction of semi-reduced
    aggregate inputs (SF1 Q17)."""
    import numpy as np

    from hyrise_tpu.database import Database
    from hyrise_tpu.expression import ast
    from hyrise_tpu.plan import lqp as L
    from hyrise_tpu.statistics.cardinality import CardinalityEstimator
    from hyrise_tpu.storage import Table
    from hyrise_tpu.types import DataType, JoinMode

    db = Database.get()
    n_k = 1000
    fact = Table.from_dict(
        {"k": np.repeat(np.arange(n_k, dtype=np.int32), 8)},
        {"k": DataType.INT},
    )
    dim = Table.from_dict(
        {"j": np.arange(5, dtype=np.int32)}, {"j": DataType.INT}
    )
    db.storage_manager.add_table("ndv_fact", fact)
    db.storage_manager.add_table("ndv_dim", dim)
    try:
        fk = ast.ColumnRef("k", DataType.INT, False, origin="ndv_fact")
        dj = ast.ColumnRef("j", DataType.INT, False, origin="ndv_dim")
        left = L.StoredTableNode("ndv_fact")
        right = L.StoredTableNode("ndv_dim")
        semi = L.JoinNode(JoinMode.SEMI, [ast.eq(fk, dj)], left, right)
        est = CardinalityEstimator().estimate(semi)
        # 8000 rows * (5 / 1000) = 40 — far below the old 0.5 * 8000
        assert est < 400, est
        anti = L.JoinNode(
            JoinMode.ANTI_NULL_AS_FALSE, [ast.eq(fk, dj)], left, right
        )
        est_a = CardinalityEstimator().estimate(anti)
        assert est_a > 7000, est_a
    finally:
        db.storage_manager.drop_table("ndv_fact")
        db.storage_manager.drop_table("ndv_dim")

"""Plugin + visualization tests (ref models:
test/lib/utils/plugin_manager_test.cpp, mvcc_delete_plugin_system_test.cpp,
ucc_discovery_plugin (system test), visualization tests)."""

import pytest

from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder, sql
from hyrise_tpu.storage import Table


def test_plugin_manager_load_unload():
    db = Database.get()
    db.plugin_manager.load_plugin("hyrise_tpu.plugins.ucc_discovery_plugin")
    assert db.plugin_manager.loaded_plugins() == ["ucc_discovery_plugin"]
    fns = db.plugin_manager.user_executable_functions()
    assert ("ucc_discovery_plugin", "DiscoverUCCs") in fns
    db.plugin_manager.unload_plugin("ucc_discovery_plugin")
    assert db.plugin_manager.loaded_plugins() == []


def test_meta_exec_runs_plugin_function():
    db = Database.get()
    db.plugin_manager.load_plugin("hyrise_tpu.plugins.ucc_discovery_plugin")
    rows = sql("SELECT * FROM meta_exec").to_pylist()
    assert ("ucc_discovery_plugin", "DiscoverUCCs") in rows
    sql(
        "INSERT INTO meta_exec (plugin_name, function_name) VALUES "
        "('ucc_discovery_plugin', 'DiscoverUCCs')"
    )


def test_ucc_discovery_installs_constraint():
    from hyrise_tpu.plugins.ucc_discovery_plugin import UccDiscoveryPlugin

    db = Database.get()
    db.storage_manager.add_table(
        "uniq", Table.from_dict({"id": [1, 2, 3, 4], "v": [1, 1, 2, 2]})
    )
    # seed the LQP cache with a group-by plan over id and v
    sql("SELECT id, COUNT(*) FROM uniq GROUP BY id")
    sql("SELECT v, COUNT(*) FROM uniq GROUP BY v")
    plugin = UccDiscoveryPlugin()
    plugin.discover_uccs()
    table = db.storage_manager.get_table("uniq")
    cols = [kc.columns for kc in table.key_constraints]
    assert ("id",) in cols   # unique -> installed
    assert ("v",) not in cols  # duplicated -> rejected


def test_mvcc_delete_plugin_compacts():
    from hyrise_tpu.plugins.mvcc_delete_plugin import MvccDeletePlugin

    db = Database.get()
    sql("CREATE TABLE gc (x INT)")
    values = ", ".join(f"({i})" for i in range(200))
    sql(f"INSERT INTO gc VALUES {values}")
    sql("DELETE FROM gc WHERE x < 150")
    assert sql("SELECT COUNT(*) FROM gc").to_pylist() == [(50,)]
    table = db.storage_manager.get_table("gc")
    assert table.mvcc.invalid_row_count() >= 150
    plugin = MvccDeletePlugin()
    plugin.clean_all()
    table = db.storage_manager.get_table("gc")
    assert table.num_rows == 50
    assert sql("SELECT COUNT(*) FROM gc").to_pylist() == [(50,)]
    assert sorted(sql("SELECT x FROM gc").to_pylist())[:2] == [(150,), (151,)]


def test_visualizers_emit_dot():
    from hyrise_tpu.optimizer import Optimizer
    from hyrise_tpu.sql.parser import parse_sql
    from hyrise_tpu.sql.translator import SQLTranslator
    from hyrise_tpu.visualization.visualizer import LQPVisualizer, PQPVisualizer

    db = Database.get()
    db.storage_manager.add_table("vt", Table.from_dict({"a": [1, 2, 3]}))
    stmt = parse_sql("SELECT a FROM vt WHERE a > 1")[0]
    lqp = Optimizer.create_default_optimizer().optimize(
        SQLTranslator().translate(stmt)
    )
    dot = LQPVisualizer().to_dot(lqp)
    assert "digraph LQP" in dot and "Predicate" in dot and "rows" in dot
    p = SQLPipelineBuilder("SELECT a FROM vt WHERE a > 1").create_pipeline()
    p.get_result_table()
    pqp = p._pipeline_statements[0].get_physical_plan()
    dot = PQPVisualizer().to_dot(pqp)
    assert "digraph PQP" in dot and "ms" in dot

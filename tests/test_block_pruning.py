"""Per-block pruning: selective range predicates over clustered data must
SKIP blocks (provably not just filter them) while producing identical
rows (ref: generate_pruning_statistics.cpp:117 + chunk_pruning_rule.cpp +
GetTable chunk skipping, get_table.hpp:57)."""

import numpy as np
import pytest

import hyrise_tpu.statistics.pruning as pruning
from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder, sql
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType


@pytest.fixture(autouse=True)
def small_blocks(monkeypatch):
    monkeypatch.setattr(pruning, "DEFAULT_BLOCK_ROWS", 256)


def _get_table_op(q):
    from hyrise_tpu.operators.get_table import GetTable
    from hyrise_tpu.sql.pipeline import SQLPipelineStatement

    ps = SQLPipelineBuilder(q).create_pipeline()
    st = SQLPipelineStatement(q, ps.statements[0])
    st._execute()
    stack = [st.get_physical_plan()]
    while stack:
        op = stack.pop()
        if isinstance(op, GetTable):
            return st, op
        stack.extend(op.inputs())
    raise AssertionError("no GetTable in plan")


def _clustered_table(n=4096):
    # values ascend with the row index: block min/max are tight ranges
    return Table.from_numpy(
        {"ts": np.arange(n, dtype=np.int64),
         "v": (np.arange(n) * 7 % 100).astype(np.float64)},
        {"ts": DataType.LONG, "v": DataType.DOUBLE},
    )


def test_range_scan_skips_blocks():
    db = Database.get()
    db.storage_manager.add_table("events", _clustered_table())
    q = "SELECT SUM(v) FROM events WHERE ts BETWEEN 100 AND 300"
    st, gt = _get_table_op(q)
    assert gt.blocks_total == 16
    assert 0 < gt.blocks_kept <= 2, f"kept {gt.blocks_kept} blocks"
    expected = float(sum((i * 7 % 100) for i in range(100, 301)))
    assert st.get_result_table().to_pylist() == [(expected,)]


def test_point_scan_and_empty_range():
    db = Database.get()
    db.storage_manager.add_table("events", _clustered_table())
    st, gt = _get_table_op("SELECT v FROM events WHERE ts = 1000")
    assert gt.blocks_kept == 1
    assert st.get_result_table().to_pylist() == [(float(1000 * 7 % 100),)]
    st, gt = _get_table_op("SELECT v FROM events WHERE ts > 100000")
    assert gt.blocks_kept == 0
    assert st.get_result_table().to_pylist() == []


def test_unclustered_data_keeps_all_blocks():
    db = Database.get()
    # every block spans the full value domain -> nothing prunable
    db.storage_manager.add_table("r", Table.from_numpy(
        {"x": np.tile(np.arange(16), 256).astype(np.int64)},
        {"x": DataType.LONG},
    ))
    st, gt = _get_table_op("SELECT COUNT(*) FROM r WHERE x BETWEEN 5 AND 9")
    assert gt.blocks_kept == gt.blocks_total
    assert st.get_result_table().to_pylist() == [(5 * 256,)]


def test_pruning_after_insert_rebuilds():
    db = Database.get()
    db.storage_manager.add_table("events", _clustered_table(1024))
    q = "SELECT COUNT(*) FROM events WHERE ts >= 1000"
    st, gt = _get_table_op(q)
    assert st.get_result_table().to_pylist() == [(24,)]
    sql("INSERT INTO events VALUES (5000, 1.0)")
    assert sql(q).to_pylist() == [(25,)]


def test_string_and_date_pruning():
    db = Database.get()
    n = 2048
    dates = np.datetime64("2020-01-01") + np.arange(n) // 4
    db.storage_manager.add_table("d", Table.from_numpy(
        {"dday": dates.astype(str),
         "grp": np.repeat(["aaa", "bbb", "ccc", "ddd"], n // 4)},
        {"dday": DataType.DATE, "grp": DataType.STRING},
    ))
    st, gt = _get_table_op(
        "SELECT COUNT(*) FROM d WHERE dday < '2020-01-05'")
    assert gt.blocks_kept < gt.blocks_total
    assert st.get_result_table().to_pylist() == [(16,)]
    st, gt = _get_table_op("SELECT COUNT(*) FROM d WHERE grp = 'bbb'")
    assert gt.blocks_kept < gt.blocks_total
    assert st.get_result_table().to_pylist() == [(n // 4,)]


def test_index_scan_with_block_pruning_parity(small_blocks):
    """Index row positions are base-table layout; when both an index and
    block pruning apply to the same stored table, the translator must not
    combine a re-packed GetTable with base-position masks (it drops the
    pruning and keeps the index).  Guards the silent-wrong-rows bug."""
    from hyrise_tpu.database import Database
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
    from hyrise_tpu.storage.table import Table

    db = Database.reset()
    n = 1024  # 4 pruning blocks at 256 rows
    t = Table.from_dict({
        "x": list(range(n)),              # clustered: blocks prunable
        "y": [i % 7 for i in range(n)],
    })
    db.storage_manager.add_table("bt", t)
    db.index_registry.create_ordered_index("bt", t, "x")

    def run(q):
        return (SQLPipelineBuilder(q).create_pipeline()
                .get_result_table().to_pylist())

    got = run("SELECT x, y FROM bt WHERE x >= 700 AND x < 720 ORDER BY x")
    assert got == [(i, i % 7) for i in range(700, 720)]
    got2 = run("SELECT x FROM bt WHERE x = 1000")
    assert got2 == [(1000,)]


def test_dynamic_pruning_from_uncorrelated_subquery():
    """WHERE col <= (SELECT ...) prunes blocks using the subquery's
    runtime scalar (ref: get_table.hpp:57-58 dynamic chunk pruning)."""
    db = Database.get()
    db.storage_manager.add_table("events", _clustered_table())
    db.storage_manager.add_table("bound", Table.from_numpy(
        {"b": np.array([300], dtype=np.int64)}, {"b": DataType.LONG}))
    q = "SELECT SUM(v) FROM events WHERE ts <= (SELECT MAX(b) FROM bound)"
    st, gt = _get_table_op(q)
    assert gt.blocks_total == 16
    assert 0 < gt.blocks_kept <= 2, f"kept {gt.blocks_kept} blocks"
    expected = float(sum((i * 7 % 100) for i in range(0, 301)))
    assert st.get_result_table().to_pylist() == [(expected,)]


def test_dynamic_pruning_null_scalar_keeps_blocks():
    """A NULL subquery scalar must not prune (scan filters to empty)."""
    db = Database.get()
    db.storage_manager.add_table("events", _clustered_table())
    db.storage_manager.add_table("bound", Table.from_dict({"b": [None]}))
    q = "SELECT v FROM events WHERE ts < (SELECT MAX(b) FROM bound)"
    st, gt = _get_table_op(q)
    assert gt.blocks_kept == gt.blocks_total
    assert st.get_result_table().to_pylist() == []

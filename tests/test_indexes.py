"""Index tests (ref model: test/lib/storage/index/*)."""

import pytest

from hyrise_tpu.database import Database
from hyrise_tpu.operators import TableWrapper, GetTable
from hyrise_tpu.operators.index_scan import IndexScan
from hyrise_tpu.storage import Table
from hyrise_tpu.storage.index import HashIndex, OrderedIndex
from hyrise_tpu.sql.pipeline import sql
from hyrise_tpu.types import PredicateCondition


@pytest.fixture
def table():
    db = Database.get()
    t = Table.from_dict(
        {"id": [5, 3, 9, 1, 7, 3], "v": ["e", "c", "i", "a", "g", "cc"]}
    )
    db.storage_manager.add_table("idx_t", t)
    return t


def test_ordered_index_range(table):
    idx = OrderedIndex(table, "id")
    mask = idx.row_mask_for_range(3, 7, table.capacity)
    rows = [i for i in range(table.num_rows) if bool(mask[i])]
    assert rows == [0, 1, 4, 5]  # ids 5,3,7,3


def test_index_scan_operator(table):
    db = Database.get()
    db.index_registry.create_ordered_index("idx_t", table, "id")
    src = GetTable("idx_t")
    scan = IndexScan(src, "idx_t", "id", PredicateCondition.GREATER_THAN, 5)
    scan.execute()
    assert sorted(scan.get_output().to_pylist()) == [(7, "g"), (9, "i")]
    src2 = GetTable("idx_t")
    eq = IndexScan(src2, "idx_t", "id", PredicateCondition.EQUALS, 3)
    eq.execute()
    assert sorted(eq.get_output().to_pylist()) == [(3, "c"), (3, "cc")]


def test_hash_index_point_lookup(table):
    idx = HashIndex(table, ["id"])
    assert idx.rows_for((3,)) == [1, 5]
    assert idx.rows_for((42,)) == []
    assert (9,) in idx


def test_index_invalidated_on_insert(table):
    db = Database.get()
    db.index_registry.create_ordered_index("idx_t", table, "id")
    assert db.index_registry.ordered_index("idx_t", "id") is not None
    sql("INSERT INTO idx_t VALUES (100, 'z')")
    assert db.index_registry.ordered_index("idx_t", "id") is None


def test_index_scan_auto_selection():
    """The translator routes selective predicates on indexed columns to
    IndexScan (ref: index_scan_rule.cpp); unindexed columns keep
    TableScan, and a stale index (rows appended) falls back."""
    import numpy as np

    from hyrise_tpu.database import Database
    from hyrise_tpu.operators.index_scan import IndexScan
    from hyrise_tpu.operators.table_scan import TableScan
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder, sql
    from hyrise_tpu.storage.table import Table
    from hyrise_tpu.types import DataType

    db = Database.get()
    n = 5000
    t = Table.from_numpy(
        {"a": np.arange(n), "b": np.arange(n) % 97},
        {"a": DataType.INT, "b": DataType.INT},
    )
    db.storage_manager.add_table("it", t)
    db.index_registry.create_ordered_index("it", t, "a")

    def plan_ops(q):
        ps = SQLPipelineBuilder(q).create_pipeline()
        from hyrise_tpu.sql.pipeline import SQLPipelineStatement

        st_ = SQLPipelineStatement(q, ps.statements[0])
        ops = []
        node = st_.get_physical_plan()
        stack = [node]
        while stack:
            op = stack.pop()
            ops.append(type(op).__name__)
            stack.extend(op.inputs())
        return ops

    assert "IndexScan" in plan_ops("SELECT b FROM it WHERE a = 123")
    assert "IndexScan" in plan_ops(
        "SELECT b FROM it WHERE a BETWEEN 10 AND 20")
    assert "IndexScan" not in plan_ops("SELECT a FROM it WHERE b = 5")
    # results match the plain scan path
    assert sql("SELECT b FROM it WHERE a = 123").to_pylist() == [(123 % 97,)]
    assert sql("SELECT COUNT(*) FROM it WHERE a BETWEEN 10 AND 20"
               ).to_pylist() == [(11,)]
    # stale index after an append: falls back to TableScan, stays correct
    sql("INSERT INTO it VALUES (99999, 7)")
    ops = plan_ops("SELECT b FROM it WHERE a = 99999")
    assert "IndexScan" not in ops and "TableScan" in ops
    assert sql("SELECT b FROM it WHERE a = 99999").to_pylist() == [(7,)]

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


def test_composite_index_lookup_and_auto_selection():
    """CompositeOrderedIndex (ref: composite_group_key_index.hpp:43): one
    packed binary search answers a multi-column equality conjunction; the
    translator fuses the predicate chain onto it and leftovers stay as
    TableScans."""
    import numpy as np

    from hyrise_tpu.operators.index_scan import CompositeIndexScan
    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder, SQLPipelineStatement
    from hyrise_tpu.storage.index import CompositeOrderedIndex
    from hyrise_tpu.types import DataType

    db = Database.get()
    n = 4000
    t = Table.from_numpy(
        {"w": np.arange(n) % 7, "d": np.arange(n) % 11,
         "v": np.arange(n, dtype=np.float64)},
        {"w": DataType.INT, "d": DataType.INT, "v": DataType.DOUBLE},
    )
    db.storage_manager.add_table("ct", t)
    idx = CompositeOrderedIndex(t, ["w", "d"])
    # direct probe: rows where w=3 AND d=5
    mask = idx.row_mask_for_equals([3, 5], t.capacity)
    expect = [i for i in range(n) if i % 7 == 3 and i % 11 == 5]
    got = [i for i in range(n) if bool(mask[i])]
    assert got == expect
    # out-of-domain probe returns empty, not wraparound
    assert not bool(idx.row_mask_for_equals([99, 5], t.capacity).any())

    db.index_registry.create_composite_index("ct", t, ["w", "d"])

    def plan_ops(q):
        ps = SQLPipelineBuilder(q).create_pipeline()
        st_ = SQLPipelineStatement(q, ps.statements[0])
        ops = []
        stack = [st_.get_physical_plan()]
        while stack:
            op = stack.pop()
            ops.append(type(op).__name__)
            stack.extend(op.inputs())
        return ops

    ops = plan_ops("SELECT v FROM ct WHERE w = 3 AND d = 5")
    assert "CompositeIndexScan" in ops
    rows = sql("SELECT v FROM ct WHERE w = 3 AND d = 5").to_pylist()
    assert sorted(r[0] for r in rows) == [float(i) for i in expect]
    # extra non-equality predicate stays as a TableScan above the probe
    ops2 = plan_ops("SELECT v FROM ct WHERE w = 3 AND d = 5 AND v > 100")
    assert "CompositeIndexScan" in ops2 and "TableScan" in ops2
    rows2 = sql(
        "SELECT COUNT(*) FROM ct WHERE w = 3 AND d = 5 AND v > 100"
    ).to_pylist()
    assert rows2 == [(sum(1 for i in expect if i > 100),)]
    # stale after insert: falls back, stays correct
    sql("INSERT INTO ct VALUES (3, 5, -1.0)")
    ops3 = plan_ops("SELECT v FROM ct WHERE w = 3 AND d = 5")
    assert "CompositeIndexScan" not in ops3
    rows3 = sql("SELECT COUNT(*) FROM ct WHERE w = 3 AND d = 5").to_pylist()
    assert rows3 == [(len(expect) + 1,)]


def test_composite_index_subset_match():
    """An index on a SUBSET of the equality conjunction still serves the
    probe; surplus equalities become residual filters."""
    import numpy as np

    from hyrise_tpu.sql.pipeline import SQLPipelineBuilder, SQLPipelineStatement
    from hyrise_tpu.types import DataType

    db = Database.get()
    n = 3000
    t = Table.from_numpy(
        {"w": np.arange(n) % 5, "d": np.arange(n) % 9,
         "c": np.arange(n) % 4},
        {"w": DataType.INT, "d": DataType.INT, "c": DataType.INT},
    )
    db.storage_manager.add_table("ct2", t)
    db.index_registry.create_composite_index("ct2", t, ["w", "d"])

    def plan_ops(q):
        ps = SQLPipelineBuilder(q).create_pipeline()
        st_ = SQLPipelineStatement(q, ps.statements[0])
        ops = []
        stack = [st_.get_physical_plan()]
        while stack:
            op = stack.pop()
            ops.append(type(op).__name__)
            stack.extend(op.inputs())
        return ops

    q = "SELECT COUNT(*) FROM ct2 WHERE w = 2 AND d = 3 AND c = 1"
    ops = plan_ops(q)
    assert "CompositeIndexScan" in ops and "TableScan" in ops
    expect = sum(1 for i in range(n)
                 if i % 5 == 2 and i % 9 == 3 and i % 4 == 1)
    assert sql(q).to_pylist() == [(expect,)]

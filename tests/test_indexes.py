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

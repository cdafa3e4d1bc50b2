"""Storage layer tests: Column/Table round trips, dictionary encoding,
gathers, StorageManager catalog (ref test model: test/lib/storage/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyrise_tpu.storage import Column, Table, StorageManager
from hyrise_tpu.storage.column import recode_to_dictionary, merge_dictionaries
from hyrise_tpu.types import DataType


def test_column_int_roundtrip():
    col = Column.from_values([3, 1, None, 7], DataType.INT)
    assert col.to_pylist(4) == [3, 1, None, 7]
    assert col.capacity == 128


def test_column_string_dictionary_sorted():
    col = Column.from_values(["pear", "apple", "fig", "apple"], DataType.STRING)
    assert list(col.dictionary) == ["apple", "fig", "pear"]
    assert col.to_pylist(4) == ["pear", "apple", "fig", "apple"]
    # sorted dictionary => code order is value order
    codes = np.asarray(col.data[:4])
    assert codes.tolist() == [2, 0, 1, 0]


def test_column_date_roundtrip():
    col = Column.from_values(["1994-01-01", "1995-12-31"], DataType.DATE)
    assert col.to_pylist(2) == ["1994-01-01", "1995-12-31"]
    assert np.asarray(col.data[:2]).tolist() == [8766, 9495]


def test_table_from_dict_and_take():
    t = Table.from_dict({"a": [1, 2, 3, 4], "b": ["x", "y", "x", "z"]})
    assert t.num_rows == 4
    assert t.column("a").data_type == DataType.INT
    assert t.column("b").data_type == DataType.STRING
    t2 = t.take(jnp.array([2, 0]), 2)
    assert t2.to_pylist() == [(3, "x"), (1, "x")]


def test_take_null_where_negative():
    t = Table.from_dict({"a": [1, 2, 3]})
    t2 = t.take(jnp.array([1, -1, 0]), 3, null_where_negative=True)
    assert t2.to_pylist() == [(2,), (None,), (1,)]


def test_recode_to_dictionary():
    a = Column.from_values(["b", "a", "c"], DataType.STRING)
    b = Column.from_values(["c", "d", "a"], DataType.STRING)
    merged = merge_dictionaries(a.dictionary, b.dictionary)
    assert list(merged) == ["a", "b", "c", "d"]
    ra = recode_to_dictionary(a, merged)
    assert np.asarray(ra[:3]).tolist() == [1, 0, 2]
    # codes not present map to -1
    target = np.array(["a", "c"])
    rb = recode_to_dictionary(b, target)
    assert np.asarray(rb[:3]).tolist() == [1, -1, 0]


def test_storage_manager():
    sm = StorageManager()
    t = Table.from_dict({"x": [1]})
    sm.add_table("t", t)
    assert sm.has_table("t")
    assert sm.table_names() == ["t"]
    with pytest.raises(ValueError):
        sm.add_table("t", t)
    assert sm.get_table("t") is t
    sm.drop_table("t")
    assert not sm.has_table("t")
    with pytest.raises(KeyError):
        sm.get_table("t")


def test_database_singleton_reset():
    from hyrise_tpu.database import Database

    db = Database.get()
    db.storage_manager.add_table("q", Table.from_dict({"x": [1]}))
    db2 = Database.reset()
    assert not db2.storage_manager.has_table("q")

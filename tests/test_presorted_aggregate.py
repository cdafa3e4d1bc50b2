"""Presorted (clustered-input) aggregation fast path: a table physically
ordered by its single group key skips the slot sort entirely
(operators/aggregate.py _presorted_key; ref model: hyrise exploits
chunk.hpp:156 individually_sorted_by in AggregateSort).

The path must agree with the general dense-sorted path bit-for-bit,
including selection-masked middle rows (which keep their slot so runs stay
contiguous and are zeroed via the real-row mask)."""

import numpy as np
import pytest

from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
from hyrise_tpu.storage import Table
from hyrise_tpu.types import DataType, SortMode


def _make_table(mark_sorted: bool, n=5000, domain=3000, seed=7):
    rng = np.random.default_rng(seed)
    # ascending keys with repeats and gaps spanning a >1024 domain (forces
    # the dense-SORTED route, not the direct scatter route)
    keys = np.sort(rng.integers(0, domain, size=n).astype(np.int32))
    vals = rng.integers(-50, 50, size=n).astype(np.int32)
    t = Table.from_dict(
        {"k": keys, "v": vals}, {"k": DataType.INT, "v": DataType.INT}
    )
    if mark_sorted:
        t.sorted_by = [("k", SortMode.ASC_NULLS_LAST)]
    return t, keys, vals


def _run(sql):
    return SQLPipelineBuilder(sql).create_pipeline().get_result_table()


@pytest.mark.parametrize("filtered", [False, True])
def test_presorted_matches_general(filtered):
    db = Database.get()
    results = {}
    for mark in (True, False):
        t, keys, vals = _make_table(mark)
        name = f"pre_{int(mark)}_{int(filtered)}"
        db.storage_manager.add_table(name, t)
        where = "WHERE v >= 0 " if filtered else ""
        out = _run(
            f"SELECT k, SUM(v), COUNT(*), MIN(v), MAX(v), AVG(v) "
            f"FROM {name} {where}GROUP BY k ORDER BY k"
        )
        results[mark] = out.to_pylist()
        db.storage_manager.drop_table(name)

    assert results[True] == results[False]

    # independent numpy oracle
    t, keys, vals = _make_table(True)
    if filtered:
        sel = vals >= 0
        keys, vals = keys[sel], vals[sel]
    expect = []
    for k in np.unique(keys):
        v = vals[keys == k]
        expect.append((int(k), int(v.sum()), int(v.size), int(v.min()),
                       int(v.max()), float(v.mean())))
    got = [
        (r[0], r[1], r[2], r[3], r[4], pytest.approx(r[5]))
        for r in results[True]
    ]
    assert [tuple(r[:6]) for r in results[True]] == [
        pytest.approx(e) for e in expect
    ]


def test_presorted_count_distinct():
    db = Database.get()
    outs = {}
    for mark in (True, False):
        t, keys, vals = _make_table(mark, n=4000, domain=2000, seed=11)
        name = f"pred_{int(mark)}"
        db.storage_manager.add_table(name, t)
        out = _run(
            f"SELECT k, COUNT(DISTINCT v) FROM {name} GROUP BY k ORDER BY k"
        )
        outs[mark] = out.to_pylist()
        db.storage_manager.drop_table(name)
    assert outs[True] == outs[False]

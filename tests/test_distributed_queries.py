"""Distributed query execution tests on the virtual 8-device mesh:
TPC-H Q6/Q1/Q3 patterns via parallel/query.py must match the single-node
engine bit-for-bit (BASELINE: row parity across scale-out)."""

import numpy as np
import pytest

from hyrise_tpu.benchmark.tpch.generator import TPCHTableGenerator
from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.parallel.mesh import QueryMesh, partition_table
from hyrise_tpu.parallel.query import (
    column_refs,
    distributed_join_aggregate,
    distributed_scan_aggregate,
)
from hyrise_tpu.sql.pipeline import sql
from hyrise_tpu.types import AggregateFunction as AF
from hyrise_tpu.types import PredicateCondition

_TABLES = {}


@pytest.fixture
def tpch():
    if not _TABLES:
        _TABLES.update(TPCHTableGenerator(scale_factor=0.002).generate())
    db = Database.get()
    for name, t in _TABLES.items():
        db.storage_manager.add_table(name, t)
    return _TABLES


def test_distributed_q6(tpch):
    qmesh = QueryMesh()
    st = partition_table(tpch["lineitem"], qmesh)
    refs = column_refs(st)
    pred = ast.and_(
        ast.and_(
            ast.ge(refs["l_shipdate"], ast.Literal("1994-01-01", None)),
            ast.lt(refs["l_shipdate"], ast.Literal("1995-01-01", None)),
        ),
        ast.and_(
            ast.between(refs["l_discount"], ast.lit(0.05), ast.lit(0.07)),
            ast.lt(refs["l_quantity"], ast.lit(24)),
        ),
    )
    # DATE literals need the DATE type hint
    from hyrise_tpu.types import DataType

    pred.children[0].children[0].children[1]._dtype = DataType.DATE
    pred.children[0].children[1].children[1]._dtype = DataType.DATE
    occupied, results = distributed_scan_aggregate(
        st, refs, pred, [], [],
        [(AF.SUM, ast.mul(refs["l_extendedprice"], refs["l_discount"]))],
    )
    expected = sql(
        "SELECT SUM(l_extendedprice * l_discount) FROM lineitem "
        "WHERE l_shipdate >= DATE '1994-01-01' "
        "AND l_shipdate < DATE '1995-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ).to_pylist()[0][0]
    assert abs(float(results[0][0]) - expected) < 1e-6


def test_distributed_q1_groups(tpch):
    qmesh = QueryMesh()
    st = partition_table(tpch["lineitem"], qmesh)
    refs = column_refs(st)
    li = tpch["lineitem"]
    d_rf = len(li.column("l_returnflag").dictionary)
    d_ls = len(li.column("l_linestatus").dictionary)
    occupied, results = distributed_scan_aggregate(
        st, refs, None,
        [refs["l_returnflag"], refs["l_linestatus"]],
        [(0, d_rf), (0, d_ls)],
        [(AF.SUM, refs["l_quantity"]), (AF.COUNT, refs["l_quantity"]),
         (AF.AVG, refs["l_extendedprice"])],
    )
    expected = {
        (rf, ls): (sq, cnt, avg)
        for rf, ls, sq, cnt, avg in sql(
            "SELECT l_returnflag, l_linestatus, SUM(l_quantity), "
            "COUNT(l_quantity), AVG(l_extendedprice) FROM lineitem "
            "GROUP BY l_returnflag, l_linestatus"
        ).to_pylist()
    }
    rf_dict = li.column("l_returnflag").dictionary
    ls_dict = li.column("l_linestatus").dictionary
    seen = 0
    for slot in range(d_rf * d_ls):
        if occupied[slot] == 0:
            continue
        rf = rf_dict[slot // d_ls]
        ls = ls_dict[slot % d_ls]
        exp = expected[(rf, ls)]
        assert abs(float(results[0][slot]) - exp[0]) < 1e-6
        assert int(results[1][slot]) == exp[1]
        assert abs(float(results[2][slot]) - exp[2]) < 1e-6
        seen += 1
    assert seen == len(expected)


def test_distributed_q3_pattern(tpch):
    qmesh = QueryMesh()
    li = partition_table(tpch["lineitem"], qmesh)
    orders = partition_table(tpch["orders"], qmesh)
    li_refs = column_refs(li)
    o_refs = column_refs(orders)
    from hyrise_tpu.types import DataType

    date_lit = ast.Literal("1995-03-15", DataType.DATE)
    pri_dict = tpch["orders"].column("o_orderpriority").dictionary
    sums, counts, overflow = distributed_join_aggregate(
        probe=li, probe_refs=li_refs,
        build=orders, build_refs=o_refs,
        probe_key=li_refs["l_orderkey"],
        build_key=o_refs["o_orderkey"],
        probe_predicate=ast.gt(li_refs["l_shipdate"], date_lit),
        build_predicate=ast.lt(o_refs["o_orderdate"], date_lit),
        group_exprs=[],
        group_domains=[],
        value_expr=ast.mul(
            li_refs["l_extendedprice"],
            ast.sub(ast.lit(1), li_refs["l_discount"]),
        ),
        bucket_cap=4096,
        join_out_cap=1 << 15,
    )
    assert overflow == 0
    expected = sql(
        "SELECT SUM(l_extendedprice * (1 - l_discount)), COUNT(*) "
        "FROM lineitem, orders WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > DATE '1995-03-15' "
        "AND o_orderdate < DATE '1995-03-15'"
    ).to_pylist()[0]
    assert int(counts[0]) == expected[1]
    assert abs(float(sums[0]) - expected[0]) < 1e-5

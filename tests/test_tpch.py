"""TPC-H 22-query differential test vs sqlite at tiny scale
(ref model: hyriseBenchmarkTPCH --verify, benchmark_sql_executor.cpp)."""

import re

import numpy as np
import pytest

from hyrise_tpu.benchmark.tpch.generator import TPCHTableGenerator
from hyrise_tpu.benchmark.tpch.queries import TPCH_QUERIES
from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder

from tests.sqlite_oracle import SQLiteOracle, rows_match

_GENERATED = {}


def _get_tables(sf=0.002):
    if sf not in _GENERATED:
        _GENERATED[sf] = TPCHTableGenerator(scale_factor=sf).generate()
    return _GENERATED[sf]


@pytest.fixture
def tpch_env():
    tables = _get_tables()
    db = Database.get()
    oracle = SQLiteOracle()
    for name, t in tables.items():
        db.storage_manager.add_table(name, t)
        oracle.load_table(name, t)
    return oracle


def sqlite_compat(sql: str) -> str:
    """Rewrite typed DATE literals / INTERVAL arithmetic / EXTRACT for
    sqlite (which has none of them natively)."""

    def fold_interval(m):
        date = np.datetime64(m.group(1))
        sign = 1 if m.group(2) == "+" else -1
        n = int(m.group(3)) * sign
        unit = m.group(4).upper()
        if unit.startswith("DAY"):
            out = date + np.timedelta64(n, "D")
        elif unit.startswith("MONTH"):
            out = (date.astype("datetime64[M]") + np.timedelta64(n, "M")).astype(
                "datetime64[D]"
            ) + (date - date.astype("datetime64[M]").astype("datetime64[D]"))
        else:
            out = (date.astype("datetime64[Y]") + np.timedelta64(n, "Y")).astype(
                "datetime64[D]"
            ) + (date - date.astype("datetime64[Y]").astype("datetime64[D]"))
        return f"'{out}'"

    sql = re.sub(
        r"DATE\s+'(\d{4}-\d{2}-\d{2})'\s*([+-])\s*INTERVAL\s+'(\d+)'\s+(\w+)",
        fold_interval,
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(r"DATE\s+'(\d{4}-\d{2}-\d{2})'", r"'\1'", sql, flags=re.IGNORECASE)
    sql = re.sub(
        r"EXTRACT\s*\(\s*YEAR\s+FROM\s+([A-Za-z_0-9.]+)\s*\)",
        r"CAST(strftime('%Y', \1) AS INTEGER)",
        sql,
        flags=re.IGNORECASE,
    )
    return sql


@pytest.mark.parametrize("qid", sorted(TPCH_QUERIES))
def test_tpch_query(tpch_env, qid):
    sql = TPCH_QUERIES[qid]
    ours_table = SQLPipelineBuilder(sql).create_pipeline().get_result_table()
    ours = ours_table.to_pylist()
    theirs = tpch_env.execute(sqlite_compat(sql))
    ordered = " order by " in sql.lower()
    if ordered:
        # ties in ORDER BY keys may legitimately differ -> compare as
        # canonically-resorted lists over all columns
        ours_c = sorted(map(str_row, ours))
        theirs_c = sorted(map(str_row, theirs))
        assert rows_match(ours, theirs, ordered=False), _diff(qid, ours, theirs)
    else:
        assert rows_match(ours, theirs, ordered=False), _diff(qid, ours, theirs)


def str_row(r):
    return tuple("\0" if v is None else str(v) for v in r)


def _diff(qid, ours, theirs):
    return (
        f"Q{qid} mismatch: ours={len(ours)} rows, sqlite={len(theirs)} rows\n"
        f"ours[:5]={ours[:5]}\nsqlite[:5]={theirs[:5]}"
    )


def test_tpch_no_compaction_policy(tpch_env):
    """The accelerator-backend policy (skip count syncs, operate on padded
    tables — operators/base.py::maybe_compact) must give identical rows;
    forced on the CPU mesh here."""
    import hyrise_tpu.operators.base as base

    old = base._SYNC_EXPENSIVE
    base._SYNC_EXPENSIVE = True
    try:
        from hyrise_tpu.operators import compiled

        compiled.clear_cache()
        for qid in (3, 5, 10, 18):
            sql = TPCH_QUERIES[qid]
            ours = SQLPipelineBuilder(sql).create_pipeline(
            ).get_result_table().to_pylist()
            theirs = tpch_env.execute(sqlite_compat(sql))
            assert rows_match(ours, theirs, ordered=True), f"Q{qid}"
    finally:
        base._SYNC_EXPENSIVE = old
        from hyrise_tpu.operators import compiled

        compiled.clear_cache()

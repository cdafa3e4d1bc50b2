"""SQLite differential-testing oracle (ref: test/lib/sql/sqlite_testrunner/
sqlite_testrunner.hpp:39 + lib/utils/sqlite_wrapper.* — every query runs on
both engines and row sets must match)."""

from __future__ import annotations

import math
import sqlite3
from typing import Dict, List, Optional, Sequence

from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType


class _StddevSamp:
    """Sample standard deviation for sqlite (which has no stddev)."""

    def __init__(self):
        self.vals: List[float] = []

    def step(self, v):
        if v is not None:
            self.vals.append(float(v))

    def finalize(self):
        n = len(self.vals)
        if n < 2:
            return None
        mean = sum(self.vals) / n
        return math.sqrt(sum((x - mean) ** 2 for x in self.vals) / (n - 1))


class SQLiteOracle:
    def __init__(self):
        self.conn = sqlite3.connect(":memory:")
        self.conn.create_aggregate("stddev_samp", 1, _StddevSamp)
        # sqlite's LIKE is case-INSENSITIVE by default; the engine follows
        # the SQL standard (and the reference / PostgreSQL): 'Yolanda'
        # LIKE '%An%' must be false.  Align the oracle with the engine.
        self.conn.execute("PRAGMA case_sensitive_like = ON")

    def load_table(self, name: str, table: Table) -> None:
        type_map = {
            DataType.INT: "INTEGER",
            DataType.LONG: "INTEGER",
            DataType.FLOAT: "REAL",
            DataType.DOUBLE: "REAL",
            DataType.STRING: "TEXT",
            DataType.DATE: "TEXT",
        }
        cols = ", ".join(
            f'"{n}" {type_map[c.data_type]}'
            for n, c in zip(table.column_names, table.columns)
        )
        self.conn.execute(f'CREATE TABLE "{name}" ({cols})')
        rows = table.to_pylist()
        if rows:
            ph = ", ".join("?" for _ in table.column_names)
            self.conn.executemany(f'INSERT INTO "{name}" VALUES ({ph})', rows)
        self.conn.commit()

    def load_numpy(self, name: str, data: dict, types: dict) -> None:
        """Load straight from host numpy columns (no device round-trip).

        Benchmarks on real TPUs must use this: the TPU's f64 emulation
        (~48-bit mantissa) perturbs values pulled back through
        `to_pylist()`, which silently moves predicate boundaries in the
        oracle (e.g. BETWEEN ... 0.07 dropping the 0.07 bucket)."""
        from hyrise_tpu.utils.dates import days_to_date_str

        type_map = {
            DataType.INT: "INTEGER", DataType.LONG: "INTEGER",
            DataType.FLOAT: "REAL", DataType.DOUBLE: "REAL",
            DataType.STRING: "TEXT", DataType.DATE: "TEXT",
        }
        cols = ", ".join(f'"{n}" {type_map[types[n]]}' for n in data)
        self.conn.execute(f'CREATE TABLE "{name}" ({cols})')
        pycols = []
        for n, arr in data.items():
            import numpy as np

            arr = np.asarray(arr)
            if types[n] == DataType.DATE and arr.dtype.kind not in ("U", "S", "O"):
                arr = days_to_date_str(arr)
            pycols.append(arr.tolist())
        if pycols and pycols[0]:
            ph = ", ".join("?" for _ in data)
            self.conn.executemany(
                f'INSERT INTO "{name}" VALUES ({ph})', zip(*pycols)
            )
        self.conn.commit()

    def execute(self, sql: str) -> List[tuple]:
        cur = self.conn.execute(sql)
        return [tuple(r) for r in cur.fetchall()]


def make_env(tables: Dict[str, dict], types: Optional[dict] = None,
             encode: bool = False):
    """Create identical tables in hyrise_tpu and sqlite.  `encode=True`
    applies packed/RLE device encodings (the all-encodings corpus run,
    ref: base_test.hpp:84-119)."""
    db = Database.get()
    oracle = SQLiteOracle()
    for name, data in tables.items():
        t = Table.from_dict(data, (types or {}).get(name))
        oracle.load_table(name, t)  # before encode: exact host values
        db.storage_manager.add_table(name, t, encode=encode)
    return oracle


def normalize_row(row: tuple) -> tuple:
    out = []
    for v in row:
        if isinstance(v, float):
            out.append(round(v, 6))
        elif isinstance(v, bool):
            out.append(int(v))
        else:
            out.append(v)
    return tuple(out)


def rows_match(ours: List[tuple], theirs: List[tuple], ordered: bool) -> bool:
    if len(ours) != len(theirs):
        return False
    for a, b in zip(
        (ours if ordered else sorted(map(_sort_key, ours))),
        (theirs if ordered else sorted(map(_sort_key, theirs))),
    ):
        ra = a if ordered else a[1]
        rb = b if ordered else b[1]
        if not _row_eq(ra, rb):
            if not ordered:
                return _rows_match_tolerant(ours, theirs)
            return False
    return True


def _rows_match_tolerant(ours: List[tuple], theirs: List[tuple]) -> bool:
    """Unordered fallback when the sorted zip misaligns: float drift larger
    than the sort key's 1e-6 rounding (but inside _row_eq's relative
    tolerance) can place near-equal rows at different sorted positions.
    Greedy multiset matching with the tolerant comparator fixes the class
    (ref: utils/check_table_equal.cpp — canonicalize, then tolerant compare).
    O(n*m), capped to keep pathological suites fast."""
    if len(ours) > 5000:
        return False
    pool = list(theirs)
    for row in ours:
        for i, cand in enumerate(pool):
            if _row_eq(row, cand):
                pool[i] = pool[-1]
                pool.pop()
                break
        else:
            return False
    return True


def _sort_key(row):
    return (tuple("\0" if v is None else str(normalize_row((v,))[0]) for v in row), row)


def _row_eq(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x is None or y is None:
            if x is not y and not (x is None and y is None):
                return False
            continue
        if isinstance(x, float) or isinstance(y, float):
            fx, fy = float(x), float(y)
            if not math.isclose(fx, fy, rel_tol=1e-6, abs_tol=1e-6):
                return False
            continue
        if str(x) != str(y):
            return False
    return True


def order_key_projection(sql: str):
    """For an ORDER BY ... LIMIT query whose sort keys are all plain
    output columns, return their select-list indices — else None.

    A LIMIT under a NON-TOTAL ordering makes the result set itself
    nondeterministic: any engine may cut ties differently (TPC-DS Q73:
    ORDER BY cnt DESC, c_last_name LIMIT 100 with many (cnt, last_name)
    ties).  The deterministic invariant both engines MUST agree on is the
    multiset of sort-key projections of the returned rows (the reference
    faces the same class in check_table_equal and compares unordered).
    """
    try:
        from hyrise_tpu.sql.parser import parse_sql

        st = parse_sql(sql)[-1]
        if getattr(st, "limit", None) is None or not getattr(
                st, "order_by", None):
            return None
        names = []
        for expr, alias in st.select_list:
            names.append({alias} if alias else set())
            try:
                names[-1].add(expr.description())
            except Exception:
                pass
        idxs = []
        for item in st.order_by:
            try:
                d = item.expr.description()
            except Exception:
                return None
            for i, cand in enumerate(names):
                if d in cand:
                    idxs.append(i)
                    break
            else:
                return None
        if len(idxs) >= len(names):
            return None  # total ordering over output columns — no ties
        return idxs
    except Exception:
        return None


def rows_match_with_ties(sql: str, ours, theirs, ordered: bool) -> bool:
    """rows_match, tolerating LIMIT tie-cut nondeterminism: when the full
    rows differ but the query carries ORDER BY + LIMIT on a non-total
    key, accept iff the sort-key projections agree as a multiset."""
    if rows_match(ours, theirs, ordered):
        return True
    idxs = order_key_projection(sql)
    if idxs is None:
        return False
    proj = lambda rows: [tuple(r[i] for i in idxs) for r in rows]
    return rows_match(proj(ours), proj(theirs), ordered=False)


def check_query(oracle: SQLiteOracle, sql: str, ordered: Optional[bool] = None):
    """Run on both engines, assert row parity.  Returns our rows."""
    ours_table = SQLPipelineBuilder(sql).create_pipeline().get_result_table()
    ours = ours_table.to_pylist() if ours_table is not None else []
    theirs = oracle.execute(sql)
    if ordered is None:
        ordered = " order by " in sql.lower()
    assert rows_match_with_ties(sql, ours, theirs, ordered), (
        f"row mismatch for {sql!r}:\n  ours  ({len(ours)}): {ours[:10]}\n"
        f"  sqlite({len(theirs)}): {theirs[:10]}"
    )
    return ours

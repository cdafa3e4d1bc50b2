"""Exhaustive join-configuration cube, differentially checked vs sqlite
(ref: test/lib/operators/join_test_runner.cpp — the reference enumerates
join mode x predicate x data type x encoding x table type x size against
a naive JoinVerification operator; our oracle is sqlite, and "encoding"
collapses to the single columnar device layout by design).

Cube: 7 join modes x 4 key dtypes x {nulls, no-nulls} x {unique,
duplicate keys} x 4 size pairs (incl. empty and 1-row inputs) = 448
generated cases."""

import numpy as np
import pytest

from hyrise_tpu.database import Database
from hyrise_tpu.storage.table import Table
from hyrise_tpu.sql.pipeline import sql as run_sql
from hyrise_tpu.types import DataType

from tests.sqlite_oracle import SQLiteOracle, rows_match

MODES = {
    "inner": "SELECT l.k, l.v, r.k, r.w FROM l JOIN r ON l.k = r.k "
             "ORDER BY l.v, r.w",
    "left": "SELECT l.k, l.v, r.k, r.w FROM l LEFT JOIN r ON l.k = r.k "
            "ORDER BY l.v, r.w",
    "right": "SELECT l.k, l.v, r.k, r.w FROM l RIGHT JOIN r ON l.k = r.k "
             "ORDER BY l.v, r.w",
    "full": "SELECT l.k, l.v, r.k, r.w FROM l FULL OUTER JOIN r "
            "ON l.k = r.k ORDER BY l.v, r.w",
    "semi": "SELECT k, v FROM l WHERE EXISTS "
            "(SELECT * FROM r WHERE r.k = l.k) ORDER BY v",
    "anti": "SELECT k, v FROM l WHERE NOT EXISTS "
            "(SELECT * FROM r WHERE r.k = l.k) ORDER BY v",
    "not_in": "SELECT k, v FROM l WHERE k NOT IN (SELECT k FROM r) "
              "ORDER BY v",
}
DTYPES = ["int", "float", "string", "date"]
SIZES = [(0, 5), (1, 1), (13, 7), (96, 160)]


def _keys(rng, n, dtype, nulls, dupes):
    """Python key values for n rows."""
    domain = max(n // 3, 2) if dupes else max(4 * n, 8)
    raw = rng.choice(np.arange(domain), size=n, replace=dupes)
    if dtype == "int":
        vals = [int(x) for x in raw]
    elif dtype == "float":
        vals = [float(x) + 0.5 for x in raw]
    elif dtype == "string":
        vals = [f"key_{x:04d}" for x in raw]
    else:  # date
        base = np.datetime64("2020-01-01")
        vals = [str(base + int(x)) for x in raw]
    if nulls and n:
        for i in range(0, n, 4):
            vals[i] = None
    return vals


_DT = {"int": DataType.INT, "float": DataType.DOUBLE,
       "string": DataType.STRING, "date": DataType.DATE}


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("mode", sorted(MODES))
def test_join_cube(mode, dtype):
    rng = np.random.default_rng(hash((mode, dtype)) % 2**32)
    db = Database.get()
    query = MODES[mode]
    for nulls in (False, True):
        for dupes in (False, True):
            for n_l, n_r in SIZES:
                lk = _keys(rng, n_l, dtype, nulls, dupes)
                rk = _keys(rng, n_r, dtype, nulls, dupes)
                lt = Table.from_dict(
                    {"k": lk, "v": list(range(n_l))},
                    types={"k": _DT[dtype], "v": DataType.INT},
                )
                rt = Table.from_dict(
                    {"k": rk, "w": list(range(n_r))},
                    types={"k": _DT[dtype], "w": DataType.INT},
                )
                for name, t in (("l", lt), ("r", rt)):
                    if db.storage_manager.has_table(name):
                        db.storage_manager.replace_table(name, t)
                    else:
                        db.storage_manager.add_table(name, t)
                oracle = SQLiteOracle()
                oracle.load_table("l", lt)
                oracle.load_table("r", rt)
                ours = run_sql(query).to_pylist()
                theirs = oracle.execute(query)
                assert rows_match(ours, theirs, ordered=False), (
                    f"{mode}/{dtype} nulls={nulls} dupes={dupes} "
                    f"sizes=({n_l},{n_r}):\n ours={ours[:5]}\n"
                    f" sqlite={theirs[:5]}"
                )

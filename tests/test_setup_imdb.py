"""Real-IMDB acquisition pipeline (scripts/setup_imdb.py): JOB-format
headerless CSVs (escaped, comma-separated, empty = NULL) convert to .npz
snapshots that load through the file-based path and answer JOB-shaped SQL
(ref: scripts/setup_imdb.py + benchmark/join_order_benchmark.cpp)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.setup_imdb import SCHEMA, convert


@pytest.fixture
def imdb_csvs(tmp_path):
    src = tmp_path / "csv"
    src.mkdir()
    (src / "title.csv").write_text(
        '1,"The Matrix",,1,1999,,"M1236",,,,"1999-1999","abc"\n'
        '2,"Heat",,1,1995,,"H3",,,,,"def"\n'
        '3,"Unknown, The",,2,,,"U525",,,,,"ghi"\n'
    )
    (src / "movie_companies.csv").write_text(
        '1,1,10,1,"(co-production)"\n'
        "2,2,11,1,\n"
        "3,3,10,2,\n"
    )
    (src / "company_name.csv").write_text(
        '10,"Warner Bros","[us]",,,,"x"\n'
        '11,"Regency \\"Ent\\"","[us]",,,,"y"\n'
        # real-IMDB pathologies: an embedded newline inside a quoted
        # field and a PostgreSQL literal-backslash escape
        '12,"Multi\nLine \\\\ Co","[de]",,,,"z"\n'
    )
    return src


def test_convert_and_query(imdb_csvs, tmp_path):
    out = tmp_path / "npz"
    convert(str(imdb_csvs), str(out))
    assert sorted(p.name for p in out.iterdir()) == [
        "company_name.npz", "movie_companies.npz", "title.npz",
    ]

    from hyrise_tpu.benchmark.file_based_benchmark import load_tables_from_dir
    from hyrise_tpu.database import Database
    from hyrise_tpu.sql.pipeline import sql

    db = Database.get()
    for name in ("title", "movie_companies", "company_name"):
        if db.storage_manager.has_table(name):
            db.storage_manager.drop_table(name)
    tables = load_tables_from_dir(str(out))
    assert tables["title"].num_rows == 3
    # NULL production_year survives the round trip
    assert sql(
        "SELECT COUNT(*) FROM title WHERE production_year IS NULL"
    ).to_pylist() == [(1,)]
    # JOB-shaped join over the converted tables
    rows = sql(
        "SELECT t.title, cn.name FROM title t, movie_companies mc, "
        "company_name cn WHERE t.id = mc.movie_id "
        "AND mc.company_id = cn.id AND cn.name LIKE 'Warner%' "
        "ORDER BY t.title"
    ).to_pylist()
    assert rows == [("The Matrix", "Warner Bros"), ("Unknown, The",
                                                    "Warner Bros")]
    # embedded newline + literal backslash survive conversion
    rows = sql(
        "SELECT name FROM company_name WHERE id = 12"
    ).to_pylist()
    assert rows == [("Multi\nLine \\ Co",)]


def test_schema_covers_query_columns():
    """Every column the built-in 113-query set references must exist in
    the conversion schema (guards schema drift against queries.py)."""
    import re

    from hyrise_tpu.benchmark.job.queries import JOB_QUERIES

    cols = {c for cols_ in SCHEMA.values() for c, _ in cols_}
    referenced = set()
    for q in JOB_QUERIES.values():
        for m in re.finditer(r"\b[a-z][a-z_0-9]*\.([a-z][a-z_0-9]*)\b", q):
            referenced.add(m.group(1))
    missing = {
        c for c in referenced
        if c not in cols and c not in ("id",)
    }
    assert not missing, f"schema missing columns: {sorted(missing)}"

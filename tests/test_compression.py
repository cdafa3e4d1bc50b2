"""FOR/bit-packed device storage (ref: storage/frame_of_reference_segment.hpp:39,
vector_compression/compressed_vector_type.hpp:28-33 — encoded segments must be
transparent to every operator; ref chunk_encoder.hpp applies encoding to full
chunks and DML never mutates encoded chunks)."""

import numpy as np
import pytest

from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder
from hyrise_tpu.storage.compression import (
    PackedArray,
    choose_bit_width,
    decode_numpy,
    encode_numpy,
)
from hyrise_tpu.storage.table import Table

from tests.sqlite_oracle import SQLiteOracle, rows_match


def run_sql(sql: str):
    t = SQLPipelineBuilder(sql).create_pipeline().get_result_table()
    return t.to_pylist() if t is not None else None


# ----------------------------------------------------------------- unit level


def test_choose_bit_width():
    assert choose_bit_width(0) == 1
    assert choose_bit_width(1) == 1
    assert choose_bit_width(2) == 2
    assert choose_bit_width(15) == 4
    assert choose_bit_width(16) == 8
    assert choose_bit_width(255) == 8
    assert choose_bit_width(65535) == 16
    assert choose_bit_width(65536) == 32
    assert choose_bit_width(2**32 - 1) == 32
    assert choose_bit_width(2**32) is None


@pytest.mark.parametrize("dtype", [np.int32, np.int64])
@pytest.mark.parametrize("lo,hi", [(0, 2), (-3, 3), (100, 4000), (-(2**33), -(2**33) + 40000)])
def test_roundtrip(dtype, lo, hi):
    if dtype == np.int32 and abs(lo) > 2**31:
        pytest.skip("out of int32 range")
    rng = np.random.default_rng(7)
    cap, n = 1024, 1000
    v = np.zeros(cap, dtype=dtype)
    v[:n] = rng.integers(lo, hi, n).astype(dtype)
    p = encode_numpy(v, None, n)
    assert isinstance(p, PackedArray)
    d = decode_numpy(p)
    assert d.dtype == v.dtype
    assert (d[:n] == v[:n]).all()
    # padding decodes to the reference value (masked by consumers)
    assert (d[n:] == p.reference).all()


def test_nulls_pack_as_reference():
    cap, n = 256, 200
    v = np.arange(cap, dtype=np.int64) * 1000  # NULL rows hold garbage
    valid = np.ones(cap, dtype=bool)
    valid[50:60] = False
    v[50:60] = 10**15  # garbage under NULL must not widen the span
    p = encode_numpy(v, valid, n)
    assert p is not None
    d = decode_numpy(p)
    live = valid[:n]
    assert (d[:n][live] == v[:n][live]).all()


def test_unprofitable_declined():
    # span needs 32 bits -> int32 ratio 1.0 < 2.0 -> decline
    v = np.array([0, 2**31 - 1] * 512, dtype=np.int32)
    assert encode_numpy(v, None, len(v)) is None
    # floats decline
    f = np.linspace(0, 1, 1024, dtype=np.float64)
    assert encode_numpy(f, None, 1024) is None
    # int64 with a 32-bit span packs at ratio 2
    w = np.array([0, 2**31 - 1] * 512, dtype=np.int64)
    assert encode_numpy(w, None, len(w)).bit_width == 32


def test_column_take_and_signature():
    t = Table.from_dict({"a": list(range(100)), "f": [float(i) for i in range(100)]})
    t.encode_packed()
    col = t.column("a")
    assert col.is_packed
    assert not t.column("f").is_packed  # floats stay raw
    import jax.numpy as jnp

    taken = col.take(jnp.asarray([5, 0, 99]))
    assert not taken.is_packed
    assert taken.to_pylist(3) == [5, 0, 99]
    # stage-cache signatures must distinguish packed from raw layouts
    from hyrise_tpu.operators.compiled import table_signature

    t2 = Table.from_dict({"a": list(range(100)), "f": [float(i) for i in range(100)]})
    assert table_signature(t) != table_signature(t2)


# ------------------------------------------------------------------ SQL level


TABLE = {
    "a": list(range(1, 2001)),
    "b": [i % 13 for i in range(2000)],
    "s": ["name%02d" % (i % 37) for i in range(2000)],
    "d": [None if i % 17 == 0 else (i * 7) % 500 for i in range(2000)],
    "f": [round(0.01 * (i % 900), 2) for i in range(2000)],
}

QUERIES = [
    ("SELECT COUNT(*), SUM(a), MIN(b), MAX(d) FROM t WHERE a BETWEEN 37 AND 1500", False),
    ("SELECT b, COUNT(*), SUM(f) FROM t WHERE d IS NOT NULL GROUP BY b ORDER BY b", True),
    ("SELECT s, COUNT(*) FROM t WHERE s LIKE 'name1%' GROUP BY s ORDER BY s", True),
    ("SELECT a, s FROM t WHERE d > 490 ORDER BY a LIMIT 7", True),
    ("SELECT t1.b, COUNT(*) FROM t t1 JOIN t t2 ON t1.a = t2.d GROUP BY t1.b ORDER BY t1.b", True),
    ("SELECT DISTINCT b FROM t WHERE a < 100 ORDER BY b", True),
]


@pytest.fixture
def packed_env():
    db = Database.get()
    t = Table.from_dict(TABLE)
    db.storage_manager.add_table("t", t, encode=True)
    packed = [n for n, c in zip(t.column_names, t.columns) if c.is_packed]
    assert set(packed) >= {"a", "b", "s", "d"}, packed
    oracle = SQLiteOracle()
    oracle.load_table("t", t)
    return oracle


def test_sql_parity_on_packed(packed_env):
    for sql, ordered in QUERIES:
        ours = run_sql(sql)
        theirs = packed_env.execute(sql)
        assert rows_match(ours, theirs, ordered), (sql, ours[:5], theirs[:5])


def test_packed_matches_unpacked():
    db = Database.get()
    t1 = Table.from_dict(TABLE)
    t2 = Table.from_dict(TABLE)
    db.storage_manager.add_table("tp", t1, encode=True)
    db.storage_manager.add_table("tr", t2)
    for sql, ordered in QUERIES:
        ours = run_sql(sql.replace(" t ", " tp ").replace(" t,", " tp,"))
        raw = run_sql(sql.replace(" t ", " tr ").replace(" t,", " tr,"))
        assert rows_match(ours, raw, ordered), sql


def test_dml_decodes_then_appends():
    db = Database.get()
    t = Table.from_dict({"a": list(range(500)), "s": ["v%d" % (i % 3) for i in range(500)]})
    db.storage_manager.add_table("t", t, encode=True)
    assert t.column("a").is_packed
    run_sql("INSERT INTO t VALUES (9999, 'new')")
    tt = db.storage_manager.get_table("t")
    assert not any(c.is_packed for c in tt.columns)
    assert run_sql("SELECT COUNT(*), MAX(a) FROM t") == [(501, 9999)]
    assert run_sql("SELECT COUNT(*) FROM t WHERE s = 'new'") == [(1,)]


def test_insert_select_from_packed():
    db = Database.get()
    src = Table.from_dict({"a": list(range(300)), "s": ["x%d" % (i % 5) for i in range(300)]})
    db.storage_manager.add_table("src", src, encode=True)
    run_sql("CREATE TABLE dst (a INT, s VARCHAR)")
    run_sql("INSERT INTO dst SELECT a, s FROM src WHERE a < 50")
    assert run_sql("SELECT COUNT(*), SUM(a) FROM dst") == [(50, sum(range(50)))]


def test_setting_disables_packing():
    db = Database.get()
    db.settings_manager.get_setting("storage.packed_encoding").set("off")
    try:
        t = Table.from_dict({"a": list(range(100))})
        db.storage_manager.add_table("t", t, encode=True)
        assert not t.column("a").is_packed
    finally:
        db.settings_manager.get_setting("storage.packed_encoding").set("on")


def test_meta_segments_reports_encoding():
    db = Database.get()
    t = Table.from_dict({"a": list(range(1000)), "f": [0.5] * 1000})
    db.storage_manager.add_table("t", t, encode=True)
    rows = run_sql(
        "SELECT column_name, encoding_type FROM meta_segments "
        "WHERE table_name = 't' ORDER BY column_name"
    )
    enc = dict(rows)
    assert enc["a"] == "FrameOfReference"
    assert enc["f"] == "RunLength"  # constant float column: 1 run


def test_distributed_partition_of_packed_table():
    db = Database.get()
    t = Table.from_dict({"a": list(range(1, 1025)), "b": [i % 5 for i in range(1024)]})
    db.storage_manager.add_table("t", t, encode=True)
    from hyrise_tpu.parallel.mesh import QueryMesh
    from hyrise_tpu.parallel.dtable import partition_base, gather_dtable

    qmesh = QueryMesh()
    sb = partition_base(t, qmesh)
    assert sb.num_rows == 1024


# --------------------------------------------------------------------- RLE


def test_rle_roundtrip():
    from hyrise_tpu.storage.compression import decode_rle_numpy, encode_rle_numpy

    cap, n = 8192, 8000
    v = np.zeros(cap, dtype=np.int64)
    v[:n] = np.repeat(np.arange(20, dtype=np.int64) * 7 - 50, 400)
    r = encode_rle_numpy(v, None, n)
    assert r is not None and r.n_runs == 20
    d = decode_rle_numpy(r)
    assert (d[:n] == v[:n]).all()
    # floats RLE-encode too (packing can't)
    f = np.zeros(cap, dtype=np.float64)
    f[:n] = np.repeat(np.linspace(0, 1, 16), 500)
    rf = encode_rle_numpy(f, None, n)
    assert rf is not None and rf.n_runs == 16
    assert (decode_rle_numpy(rf)[:n] == f[:n]).all()


def test_rle_declines_high_run_count_and_nulls():
    from hyrise_tpu.storage.compression import encode_rle_numpy

    v = np.arange(4096, dtype=np.int64)  # all distinct: runs == rows
    assert encode_rle_numpy(v, None, 4096) is None
    w = np.repeat(np.arange(8, dtype=np.int64), 512)
    valid = np.ones(4096, dtype=bool)
    valid[7] = False
    assert encode_rle_numpy(w, valid, 4096) is None  # NULLs decline
    assert encode_rle_numpy(w, None, 4096) is not None


def test_rle_column_take_and_decode():
    import jax.numpy as jnp

    from hyrise_tpu.storage.column import Column
    from hyrise_tpu.types import DataType

    n = 4096
    host = np.repeat(np.arange(4, dtype=np.float64) * 1.5, n // 4)
    col = Column.from_device(jnp.asarray(host), DataType.DOUBLE)
    enc = col.encode_packed(n)
    assert enc.is_rle and not enc.is_packed
    taken = enc.take(jnp.asarray([0, 1024, 2048, 4095]))
    assert not taken.is_rle
    assert taken.to_pylist(4) == [0.0, 1.5, 3.0, 4.5]
    assert (enc.host_raw(n) == host).all()
    dec = enc.decoded()
    assert not dec.is_rle
    assert np.allclose(np.asarray(dec.data), host)


def test_sql_parity_on_rle_sorted_column():
    """A clustered (sorted) float fact column RLE-encodes and every SQL
    shape over it matches sqlite."""
    db = Database.reset()
    n = 4096
    data = {
        "k": list(range(n)),
        # 8 long runs: the classic sorted/clustered-column shape
        "price": [float(10 * (i // 512)) for i in range(n)],
        "qty": [i % 7 for i in range(n)],
    }
    t = Table.from_dict(data)
    assert t.encode_packed() >= 1
    assert any(c.is_rle for c in t.columns), "price should RLE-encode"
    db.storage_manager.add_table("facts", t)
    oracle = SQLiteOracle()
    oracle.load_table("facts", t)
    for q in [
        "SELECT SUM(price) FROM facts",
        "SELECT price, COUNT(*) FROM facts GROUP BY price",
        "SELECT SUM(qty) FROM facts WHERE price >= 20.0 AND price < 40.0",
        "SELECT k FROM facts WHERE price = 30.0 AND qty = 3",
        "SELECT price * 2 + qty FROM facts WHERE k < 10",
    ]:
        got = run_sql(q)
        exp = oracle.execute(q)
        assert rows_match(got, exp, ordered=False), q

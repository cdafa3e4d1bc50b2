"""Server + console end-to-end tests (ref model:
test/lib/server/server_test_runner.cpp boots a real server and connects;
scripts/test/hyriseConsole_test.py drives the REPL)."""

import asyncio
import io
import struct

import pytest

from hyrise_tpu.console import Console, format_table
from hyrise_tpu.database import Database
from hyrise_tpu.storage import Table


class MiniPGClient:
    """Tiny pg-wire v3 client for tests (the reference uses libpqxx)."""

    def __init__(self, reader, writer):
        self.reader = reader
        self.writer = writer

    @classmethod
    async def connect(cls, host, port):
        reader, writer = await asyncio.open_connection(host, port)
        self = cls(reader, writer)
        # startup: protocol 3.0, user=test
        params = b"user\x00test\x00\x00"
        body = struct.pack("!I", 196608) + params
        writer.write(struct.pack("!I", len(body) + 4) + body)
        await writer.drain()
        await self._until(b"Z")
        return self

    async def _until(self, stop_type):
        messages = []
        while True:
            header = await self.reader.readexactly(5)
            (length,) = struct.unpack("!I", header[1:5])
            body = await self.reader.readexactly(length - 4)
            messages.append((header[0:1], body))
            if header[0:1] == stop_type or header[0:1] == b"E" and stop_type != b"Z":
                if header[0:1] == stop_type:
                    return messages

    async def query(self, sql):
        body = sql.encode() + b"\x00"
        self.writer.write(b"Q" + struct.pack("!I", len(body) + 4) + body)
        await self.writer.drain()
        messages = await self._until(b"Z")
        rows = []
        columns = []
        error = None
        for t, b in messages:
            if t == b"T":
                (n,) = struct.unpack("!H", b[:2])
                off = 2
                for _ in range(n):
                    end = b.index(b"\x00", off)
                    columns.append(b[off:end].decode())
                    off = end + 1 + 18
            elif t == b"D":
                (n,) = struct.unpack("!H", b[:2])
                off = 2
                row = []
                for _ in range(n):
                    (ln,) = struct.unpack("!i", b[off:off + 4])
                    off += 4
                    if ln == -1:
                        row.append(None)
                    else:
                        row.append(b[off:off + ln].decode())
                        off += ln
                rows.append(tuple(row))
            elif t == b"E":
                error = b.decode(errors="replace")
        return columns, rows, error

    def close(self):
        self.writer.write(b"X" + struct.pack("!I", 4))
        self.writer.close()


def test_pg_server_end_to_end():
    from hyrise_tpu.server.pg_server import Server

    db = Database.get()
    db.storage_manager.add_table(
        "fruits", Table.from_dict({"name": ["apple", "fig"], "qty": [3, 7]})
    )

    async def scenario():
        server = Server(port=0)
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        client = await MiniPGClient.connect("127.0.0.1", port)
        cols, rows, err = await client.query("SELECT name, qty FROM fruits ORDER BY qty")
        assert err is None
        assert cols == ["name", "qty"]
        assert rows == [("apple", "3"), ("fig", "7")]
        # errors come back as wire errors, session stays usable
        cols, rows, err = await client.query("SELECT nope FROM fruits")
        assert err is not None
        cols, rows, err = await client.query("SELECT COUNT(*) FROM fruits")
        assert err is None and rows == [("2",)]
        # DDL + DML through the wire
        _, _, err = await client.query("CREATE TABLE t2 (a INT)")
        assert err is None
        _, _, err = await client.query("INSERT INTO t2 VALUES (41), (42)")
        assert err is None
        _, rows, err = await client.query("SELECT a FROM t2 ORDER BY a")
        assert err is None and rows == [("41",), ("42",)]
        # SQL-level PREPARE/EXECUTE through the wire (prepared plans +
        # traced parameter binding live behind the same pipeline)
        _, _, err = await client.query(
            "PREPARE wq AS SELECT name FROM fruits WHERE qty = ?"
        )
        assert err is None
        _, rows, err = await client.query("EXECUTE wq (7)")
        assert err is None and rows == [("fig",)]
        _, rows, err = await client.query("EXECUTE wq (3)")
        assert err is None and rows == [("apple",)]
        client.close()
        server._server.close()

    asyncio.run(scenario())


def test_console_sql_and_commands():
    out = io.StringIO()
    console = Console(out=out)
    console.eval("CREATE TABLE c (x INT, s TEXT)")
    console.eval("INSERT INTO c VALUES (1, 'one'), (2, 'two')")
    console.eval("SELECT * FROM c ORDER BY x")
    text = out.getvalue()
    assert "one" in text and "two" in text
    assert "2 row(s)" in text
    out.truncate(0)
    console.eval("visualize SELECT x FROM c WHERE x > 1")
    assert "Predicate" in out.getvalue()
    out.truncate(0)
    console.eval("help")
    assert "generate_tpch" in out.getvalue()


def test_console_transactions():
    out = io.StringIO()
    console = Console(out=out)
    console.eval("CREATE TABLE acc (v INT)")
    console.eval("INSERT INTO acc VALUES (10)")
    console.eval("BEGIN")
    console.eval("INSERT INTO acc VALUES (20)")
    console.eval("ROLLBACK")
    out.truncate(0)
    console.eval("SELECT COUNT(*) FROM acc")
    assert "1" in out.getvalue()


def test_format_table_nulls():
    t = Table.from_dict({"a": [1, None]})
    text = format_table(t)
    assert "NULL" in text


def test_placeholder_substitution():
    # single-pass $N replacement: $10 must not be corrupted by $1, quoted
    # literals are left untouched, strings are quoted/escaped
    from hyrise_tpu.server.pg_server import _substitute_placeholders

    params = [str(i) for i in range(1, 10)] + ["ten"]
    sql = "SELECT $10, $1, '$2 stays', 'it''s $3' FROM t WHERE a = $2"
    out = _substitute_placeholders(sql, params)
    assert out == "SELECT 'ten', 1, '$2 stays', 'it''s $3' FROM t WHERE a = 2"
    assert _substitute_placeholders("SELECT $1, $3", ["x", None]) == (
        "SELECT 'x', $3"
    )


def test_pg_server_multi_client_stress():
    """Many concurrent sessions hammering the server (ref:
    test/.../stress_test.cpp + server task grouping under load,
    node_queue_scheduler.hpp:44-67): statements execute off the event
    loop behind an admission semaphore; every client's per-table inserts
    and reads must come out exact."""
    from hyrise_tpu.server.pg_server import Server

    Database.get()
    n_clients = 6
    n_rounds = 5

    async def client_work(port, cid):
        c = await MiniPGClient.connect("127.0.0.1", port)
        _, _, err = await c.query(f"CREATE TABLE stress_{cid} (v INT)")
        assert err is None, err
        total = 0
        for r in range(n_rounds):
            _, _, err = await c.query(
                f"INSERT INTO stress_{cid} VALUES ({r}), ({r + 100})")
            assert err is None, err
            total += 2
            _, rows, err = await c.query(
                f"SELECT COUNT(*) FROM stress_{cid}")
            assert err is None, err
            assert rows == [(str(total),)], (cid, r, rows)
        _, rows, err = await c.query(
            f"SELECT SUM(v) FROM stress_{cid}")
        expected = sum(r + (r + 100) for r in range(n_rounds))
        assert rows == [(str(expected),)]
        c.close()

    async def scenario():
        server = Server(port=0, max_concurrent_queries=3)
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        await asyncio.gather(*[
            client_work(port, cid) for cid in range(n_clients)
        ])
        server._server.close()

    asyncio.run(scenario())

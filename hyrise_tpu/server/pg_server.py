"""PostgreSQL wire protocol v3 server (ref: lib/server/ — server.hpp:32,
session.hpp:19, postgres_protocol_handler.hpp:28, query_handler.hpp:34,
result_serializer.hpp:15; layer doc server.hpp:13-30).

Implements the simple query protocol ('Q') and the extended protocol
(Parse/Bind/Describe/Execute/Sync) far enough for psql/psycopg-style
clients.  asyncio-based; one Session per connection.

Run: python -m hyrise_tpu.server.pg_server --port 54321
"""

from __future__ import annotations

import asyncio
import re
import struct
import sys
from typing import Dict, List, Optional, Tuple

from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder, TransactionConflict
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import DataType

# PostgreSQL type OIDs
_OID = {
    DataType.INT: 23,      # int4
    DataType.LONG: 20,     # int8
    DataType.FLOAT: 700,   # float4
    DataType.DOUBLE: 701,  # float8
    DataType.STRING: 25,   # text
    DataType.DATE: 1082,   # date
    DataType.NULL: 25,
}

SSL_REQUEST_CODE = 80877103
STARTUP_V3 = 196608
CANCEL_REQUEST_CODE = 80877102


class Session:
    """One client connection (ref: server/session.hpp:19)."""

    def __init__(self, reader: asyncio.StreamReader,
                 writer: asyncio.StreamWriter,
                 admission: Optional[asyncio.Semaphore] = None):
        self.reader = reader
        self.writer = writer
        self._prepared: Dict[str, str] = {}
        self._portals: Dict[str, Tuple[str, list]] = {}
        self._txn_context = None
        # admission control: caps concurrently-EXECUTING statements across
        # sessions (the analogue of the reference's task grouping under
        # load, node_queue_scheduler.hpp:44-67); parsing/planning and the
        # wire protocol stay fully concurrent on the event loop
        self._admission = admission or asyncio.Semaphore(4)

    # ------------------------------------------------------------- plumbing

    async def run(self) -> None:
        try:
            if not await self._startup():
                return
            self._send_auth_ok()
            self._send_parameter_status("server_version", "15.0 (hyrise_tpu)")
            self._send_parameter_status("client_encoding", "UTF8")
            self._send_ready()
            await self.writer.drain()
            while True:
                header = await self.reader.readexactly(5)
                msg_type = header[0:1]
                (length,) = struct.unpack("!I", header[1:5])
                body = await self.reader.readexactly(length - 4)
                if msg_type == b"X":  # Terminate
                    break
                await self._dispatch(msg_type, body)
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass  # client disconnect (ref: client_disconnect_exception.hpp)
        finally:
            self.writer.close()

    async def _startup(self) -> bool:
        while True:
            raw = await self.reader.readexactly(4)
            (length,) = struct.unpack("!I", raw)
            body = await self.reader.readexactly(length - 4)
            (code,) = struct.unpack("!I", body[:4])
            if code == SSL_REQUEST_CODE:
                self.writer.write(b"N")  # no SSL
                await self.writer.drain()
                continue
            if code == CANCEL_REQUEST_CODE:
                return False
            if code == STARTUP_V3:
                return True
            return False

    async def _dispatch(self, msg_type: bytes, body: bytes) -> None:
        if msg_type == b"Q":
            await self._simple_query(body)
        elif msg_type == b"P":
            self._parse(body)
        elif msg_type == b"B":
            self._bind(body)
        elif msg_type == b"D":
            self._describe(body)
        elif msg_type == b"E":
            await self._extended_execute(body)
        elif msg_type == b"S":  # Sync
            self._send_ready()
            await self.writer.drain()
        elif msg_type == b"H":  # Flush
            await self.writer.drain()
        elif msg_type == b"C":  # Close
            self._send(b"3", b"")  # CloseComplete
        else:
            self._send_error(f"unsupported message type {msg_type!r}")
            self._send_ready()
            await self.writer.drain()

    # --------------------------------------------------------- simple query

    async def _simple_query(self, body: bytes) -> None:
        sql = body.rstrip(b"\x00").decode()
        try:
            result = await self._run_pipeline(sql)
            if result is not None and result.num_columns:
                self._send_row_description(result)
                n = self._send_data_rows(result)
                self._send_command_complete(f"SELECT {n}")
            else:
                self._send_command_complete("OK")
        except TransactionConflict as exc:
            self._txn_context = None
            self._send_error(str(exc), code="40001")
        except Exception as exc:
            self._send_error(str(exc))
        self._send_ready()
        await self.writer.drain()

    async def _run_pipeline(self, sql: str):
        """Execute a statement OFF the event loop (engine work blocks) so
        other sessions keep streaming; the admission semaphore bounds how
        many statements execute at once."""

        def work():
            builder = SQLPipelineBuilder(sql)
            if self._txn_context is not None:
                builder = builder.with_transaction_context(self._txn_context)
            pipeline = builder.create_pipeline()
            tables = pipeline.get_result_tables()
            return tables, pipeline.transaction_context

        async with self._admission:
            tables, ctx = await asyncio.get_running_loop().run_in_executor(
                None, work
            )
        self._txn_context = ctx
        return tables[-1] if tables else None

    # ------------------------------------------------------ extended query

    def _parse(self, body: bytes) -> None:
        name, rest = _read_cstr(body)
        sql, rest = _read_cstr(rest)
        self._prepared[name.decode()] = sql.decode()
        self._send(b"1", b"")  # ParseComplete

    def _bind(self, body: bytes) -> None:
        portal, rest = _read_cstr(body)
        stmt, rest = _read_cstr(rest)
        (n_fmt,) = struct.unpack("!H", rest[:2])
        fmts = struct.unpack(f"!{n_fmt}H", rest[2:2 + 2 * n_fmt])
        rest = rest[2 + 2 * n_fmt:]
        (n_params,) = struct.unpack("!H", rest[:2])
        rest = rest[2:]
        if any(f == 1 for f in fmts):
            # binary parameters would be corrupted by text splicing —
            # refuse loudly; clients fall back to text format
            self._send_error("binary parameter format not supported",
                             code="0A000")
            return
        params: List[Optional[str]] = []
        for _ in range(n_params):
            (plen,) = struct.unpack("!i", rest[:4])
            rest = rest[4:]
            if plen == -1:
                params.append(None)
            else:
                params.append(rest[:plen].decode())
                rest = rest[plen:]
        self._portals[portal.decode()] = (stmt.decode(), params)
        self._send(b"2", b"")  # BindComplete

    def _describe(self, body: bytes) -> None:
        kind = body[:1]
        if kind == b"S":
            name = body[1:].split(b"\x00", 1)[0].decode()
            sql = self._prepared.get(name, "")
            n_params = len({m.group(1) for m in
                            _PLACEHOLDER_RE.finditer(sql) if m.group(1)})
            # ParameterDescription with unknown OIDs (0) — clients infer
            self._send(b"t", struct.pack("!H", n_params)
                       + struct.pack("!I", 0) * n_params)
        # NoData: the row description arrives with the Execute result
        self._send(b"n", b"")

    async def _extended_execute(self, body: bytes) -> None:
        portal, _ = _read_cstr(body)
        stmt_name, params = self._portals.get(portal.decode(), ("", []))
        sql = self._prepared.get(stmt_name, "")
        sql = _substitute_placeholders(sql, params)
        try:
            # same executor offload + admission cap as the simple path:
            # an inline pipeline would block the event loop for every
            # other session during a 30-90s first TPU compile
            result = await self._run_pipeline(sql)
            if result is not None and result.num_columns:
                self._send_row_description(result)
                n = self._send_data_rows(result)
                self._send_command_complete(f"SELECT {n}")
            else:
                self._send_command_complete("OK")
        except TransactionConflict as exc:
            self._txn_context = None
            self._send_error(str(exc), code="40001")
        except Exception as exc:
            self._send_error(str(exc))
        await self.writer.drain()

    # ----------------------------------------------------------- serializer
    # (ref: server/result_serializer.hpp:15)

    def _send_row_description(self, table: Table) -> None:
        parts = [struct.pack("!H", table.num_columns)]
        for name, col in zip(table.column_names, table.columns):
            parts.append(name.encode() + b"\x00")
            parts.append(struct.pack("!IHIhih", 0, 0, _OID[col.data_type], -1, -1, 0))
        self._send(b"T", b"".join(parts))

    def _send_data_rows(self, table: Table) -> int:
        rows = table.to_pylist()
        for row in rows:
            parts = [struct.pack("!H", len(row))]
            for v in row:
                if v is None:
                    parts.append(struct.pack("!i", -1))
                else:
                    data = _render_value(v).encode()
                    parts.append(struct.pack("!i", len(data)) + data)
            self._send(b"D", b"".join(parts))
        return len(rows)

    def _send_command_complete(self, tag: str) -> None:
        self._send(b"C", tag.encode() + b"\x00")

    def _send_auth_ok(self) -> None:
        self._send(b"R", struct.pack("!I", 0))

    def _send_parameter_status(self, key: str, value: str) -> None:
        self._send(b"S", key.encode() + b"\x00" + value.encode() + b"\x00")

    def _send_ready(self) -> None:
        status = b"T" if self._txn_context is not None else b"I"
        self._send(b"Z", status)

    def _send_error(self, message: str, code: str = "XX000") -> None:
        body = (
            b"SERROR\x00" + b"C" + code.encode() + b"\x00"
            + b"M" + message.encode() + b"\x00\x00"
        )
        self._send(b"E", body)

    def _send(self, msg_type: bytes, body: bytes) -> None:
        self.writer.write(msg_type + struct.pack("!I", len(body) + 4) + body)


def _render_value(v) -> str:
    if isinstance(v, float):
        return repr(v)
    return str(v)


_NUMERIC_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def _quote_param(p: str) -> str:
    # strict numeric-token check: float() also accepts 'NaN', 'Infinity',
    # '1_0' and padded strings, which would splice malformed SQL
    if _NUMERIC_RE.match(p):
        return p
    return "'" + p.replace("'", "''") + "'"


_PLACEHOLDER_RE = re.compile(r"'(?:[^']|'')*'|\$(\d+)")


def _substitute_placeholders(sql: str, params: List[Optional[str]]) -> str:
    """Single-pass $N substitution keyed by the captured index.

    Splicing with sequential str.replace corrupts $10+ (prefix match with $1)
    and rewrites placeholders inside string literals; the alternation above
    consumes quoted literals whole so only real placeholders are replaced.
    """

    def repl(m: "re.Match[str]") -> str:
        if m.group(1) is None:
            return m.group(0)  # quoted literal — leave untouched
        i = int(m.group(1)) - 1
        if i < 0 or i >= len(params):
            return m.group(0)
        p = params[i]
        return "NULL" if p is None else _quote_param(p)

    return _PLACEHOLDER_RE.sub(repl, sql)


def _read_cstr(data: bytes) -> Tuple[bytes, bytes]:
    idx = data.index(b"\x00")
    return data[:idx], data[idx + 1:]


class Server:
    """Ref: server/server.hpp:32."""

    def __init__(self, host: str = "127.0.0.1", port: int = 54321,
                 max_concurrent_queries: Optional[int] = None):
        self.host = host
        self.port = port
        self.max_concurrent_queries = max_concurrent_queries
        self._server: Optional[asyncio.AbstractServer] = None
        self._admission: Optional[asyncio.Semaphore] = None

    async def start(self) -> None:
        db = Database.get()  # initialize managers up-front
        limit = self.max_concurrent_queries
        if limit is None:
            from hyrise_tpu.meta.settings_manager import Setting

            sm = db.settings_manager
            if not sm.has_setting("server.max_concurrent_queries"):
                sm.register(Setting(
                    "server.max_concurrent_queries", "4",
                    "statements executing at once across sessions",
                ))
            limit = int(sm.get_setting("server.max_concurrent_queries").get())
        self._admission = asyncio.Semaphore(max(limit, 1))
        self._server = await asyncio.start_server(
            self._on_connect, self.host, self.port
        )

    async def serve_forever(self) -> None:
        await self.start()
        addrs = ", ".join(str(s.getsockname()) for s in self._server.sockets)
        print(f"hyrise_tpu server listening on {addrs}", file=sys.stderr)
        async with self._server:
            await self._server.serve_forever()

    async def _on_connect(self, reader, writer) -> None:
        await Session(reader, writer, admission=self._admission).run()


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=54321)
    ap.add_argument("--generate-tpch", type=float, default=None,
                    help="pre-generate TPC-H data at this scale factor "
                         "(ref: bin/server.cpp:44 benchmark-data flag)")
    args = ap.parse_args(argv)
    if args.generate_tpch is not None:
        from hyrise_tpu.benchmark.tpch.generator import TPCHTableGenerator

        TPCHTableGenerator(scale_factor=args.generate_tpch).generate_into(
            Database.get().storage_manager
        )
    asyncio.run(Server(args.host, args.port).serve_forever())


if __name__ == "__main__":
    main()

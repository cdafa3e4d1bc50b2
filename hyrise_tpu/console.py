"""Interactive console (ref: bin/console/console.cpp — readline REPL with
commands registered at :154-170: help, generate_tpch, load/export table,
script, print, visualize, settings, txn control).

Run: python -m hyrise_tpu.console
"""

from __future__ import annotations

import sys
import time
from typing import List, Optional

from hyrise_tpu.database import Database
from hyrise_tpu.sql.pipeline import SQLPipelineBuilder, TransactionConflict
from hyrise_tpu.storage.table import Table


class Console:
    PROMPT = "> "

    def __init__(self, out=None):
        self.out = out or sys.stdout
        self.db = Database.get()
        self._explicit_context = None
        self.commands = {
            "help": self._help,
            "generate_tpch": self._generate_tpch,
            "generate_ssb": self._generate_ssb,
            "load": self._load,
            "export": self._export,
            "script": self._script,
            "print": self._print_table,
            "visualize": self._visualize,
            "txinfo": self._txinfo,
            "begin": self._begin,
            "commit": self._commit,
            "rollback": self._rollback,
            "settings": self._settings,
            "quit": self._quit,
            "exit": self._quit,
        }
        self._running = True

    # ---------------------------------------------------------------- loop

    def run(self) -> None:
        try:
            import readline  # noqa: F401  (history/edit support)
        except ImportError:
            pass
        self._write("hyrise_tpu console — 'help' lists commands; SQL executes directly\n")
        while self._running:
            try:
                line = input(self.PROMPT)
            except (EOFError, KeyboardInterrupt):
                break
            self.eval(line)

    def eval(self, line: str) -> None:
        line = line.strip()
        if not line:
            return
        head = line.split()[0].lower()
        if head in self.commands:
            args = line[len(head):].strip()
            try:
                self.commands[head](args)
            except Exception as exc:
                self._write(f"Error: {exc}\n")
            return
        self._run_sql(line)

    def _run_sql(self, sql: str) -> None:
        t0 = time.perf_counter()
        try:
            builder = SQLPipelineBuilder(sql)
            if self._explicit_context is not None:
                builder = builder.with_transaction_context(self._explicit_context)
            pipeline = builder.create_pipeline()
            tables = pipeline.get_result_tables()
            self._explicit_context = pipeline.transaction_context
        except TransactionConflict as exc:
            self._explicit_context = None
            self._write(f"Transaction conflict: {exc}\n")
            return
        except Exception as exc:
            self._write(f"Error: {exc}\n")
            return
        elapsed = time.perf_counter() - t0
        result = tables[-1] if tables else None
        if result is not None:
            self._write(format_table(result))
            self._write(
                f"({result.valid_count} row(s) in {elapsed * 1e3:.1f} ms)\n"
            )
        else:
            self._write(f"OK ({elapsed * 1e3:.1f} ms)\n")

    # ------------------------------------------------------------ commands

    def _help(self, args: str) -> None:
        self._write(
            "Commands:\n"
            "  generate_tpch SF     generate TPC-H tables at scale factor\n"
            "  generate_ssb SF      generate Star Schema Benchmark tables\n"
            "  load FILE NAME       import a .tbl/.csv/.npz file as table\n"
            "  export NAME FILE     export a table\n"
            "  script FILE          run SQL statements from a file\n"
            "  print NAME           print a stored table\n"
            "  visualize [SQL]      show the optimized plan for a query\n"
            "  begin|commit|rollback  explicit transaction control\n"
            "  txinfo               show transaction status\n"
            "  settings             list settings\n"
            "  quit                 leave\n"
            "Anything else is executed as SQL.\n"
        )

    def _generate_tpch(self, args: str) -> None:
        from hyrise_tpu.benchmark.tpch.generator import TPCHTableGenerator

        sf = float(args) if args else 0.01
        t0 = time.perf_counter()
        tables = TPCHTableGenerator(scale_factor=sf).generate_into(
            self.db.storage_manager
        )
        self._write(
            f"generated {len(tables)} TPC-H tables at SF{sf} in "
            f"{time.perf_counter() - t0:.1f}s\n"
        )

    def _generate_ssb(self, args: str) -> None:
        from hyrise_tpu.benchmark.ssb.generator import SSBTableGenerator

        sf = float(args) if args else 0.01
        t0 = time.perf_counter()
        tables = SSBTableGenerator(scale_factor=sf).generate_into(
            self.db.storage_manager
        )
        self._write(
            f"generated {len(tables)} SSB tables at SF{sf} in "
            f"{time.perf_counter() - t0:.1f}s\n"
        )

    def _load(self, args: str) -> None:
        from hyrise_tpu.utils import load_table as io

        parts = args.split()
        path = parts[0]
        name = parts[1] if len(parts) > 1 else path.rsplit("/", 1)[-1].split(".")[0]
        table = io.load_table(path)
        if self.db.storage_manager.has_table(name):
            self.db.storage_manager.replace_table(name, table)
        else:
            self.db.storage_manager.add_table(name, table)
        self._write(f"loaded {table.num_rows} rows into {name!r}\n")

    def _export(self, args: str) -> None:
        from hyrise_tpu.utils import load_table as io

        name, path = args.split()
        table = self.db.storage_manager.get_table(name)
        if path.endswith((".npz", ".bin")):
            io.save_binary(table, path)
        else:
            io.write_csv(table, path)
        self._write(f"exported {name!r} to {path}\n")

    def _script(self, args: str) -> None:
        with open(args) as fh:
            content = fh.read()
        for stmt in content.split(";"):
            stmt = stmt.strip()
            if stmt:
                self._write(f"{self.PROMPT}{stmt}\n")
                self.eval(stmt)

    def _print_table(self, args: str) -> None:
        table = self.db.storage_manager.get_table(args.strip())
        self._write(format_table(table, limit=50))

    def _visualize(self, args: str) -> None:
        from hyrise_tpu.sql.parser import parse_sql
        from hyrise_tpu.sql.translator import SQLTranslator
        from hyrise_tpu.optimizer import Optimizer

        stmt = parse_sql(args)[0]
        lqp = SQLTranslator(use_mvcc=True).translate(stmt)
        lqp = Optimizer.create_default_optimizer().optimize(lqp)
        self._write(lqp.tree_string() + "\n")

    def _txinfo(self, args: str) -> None:
        ctx = self._explicit_context
        if ctx is None:
            self._write("auto-commit mode (no explicit transaction)\n")
        else:
            self._write(
                f"transaction {ctx.transaction_id} phase={ctx.phase.value} "
                f"snapshot={ctx.snapshot_commit_id}\n"
            )

    def _begin(self, args: str) -> None:
        self._run_sql("BEGIN")

    def _commit(self, args: str) -> None:
        self._run_sql("COMMIT")

    def _rollback(self, args: str) -> None:
        self._run_sql("ROLLBACK")

    def _settings(self, args: str) -> None:
        mgr = self.db.settings_manager
        for name in mgr.setting_names():
            s = mgr.get_setting(name)
            self._write(f"{name} = {s.get()}   ({s.description})\n")
        if not mgr.setting_names():
            self._write("(no settings registered)\n")

    def _quit(self, args: str) -> None:
        self._running = False

    def _write(self, text: str) -> None:
        self.out.write(text)
        self.out.flush()


def format_table(table: Table, limit: int = 1000) -> str:
    """ASCII rendering (ref: operators/print.hpp:27)."""
    t = table.materialize()
    rows = t.to_pylist()[:limit]
    headers = t.column_names
    cells = [[("NULL" if v is None else str(v)) for v in row] for row in rows]
    widths = [
        max(len(h), *(len(r[i]) for r in cells)) if cells else len(h)
        for i, h in enumerate(headers)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+\n"
    out = [sep]
    out.append(
        "|" + "|".join(f" {h:<{w}} " for h, w in zip(headers, widths)) + "|\n"
    )
    out.append(sep)
    for r in cells:
        out.append(
            "|" + "|".join(f" {c:<{w}} " for c, w in zip(r, widths)) + "|\n"
        )
    out.append(sep)
    if t.num_rows > limit:
        out.append(f"... ({t.num_rows - limit} more rows)\n")
    return "".join(out)


def main() -> None:
    Console().run()


if __name__ == "__main__":
    main()

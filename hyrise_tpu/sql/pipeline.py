"""SQL execution pipeline (ref: sql/sql_pipeline.hpp:36-104,
sql_pipeline_statement.cpp — lazy stages parse -> translate -> optimize ->
cache -> tasks -> execute, with per-stage metrics)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from hyrise_tpu.database import Database
from hyrise_tpu.expression import ast
from hyrise_tpu.optimizer import Optimizer
from hyrise_tpu.plan.lqp_translator import LQPTranslator
from hyrise_tpu.scheduler.tasks import OperatorTask
from hyrise_tpu.sql import statements as st
from hyrise_tpu.sql.parser import parse_sql
from hyrise_tpu.sql.translator import SQLTranslator
from hyrise_tpu.storage.storage_manager import PreparedPlan
from hyrise_tpu.storage.table import Table


class TransactionConflict(RuntimeError):
    pass


@dataclass
class SQLPipelineMetrics:
    """Ref: sql_pipeline.hpp:19-25."""

    parse_ns: int = 0
    translate_ns: int = 0
    optimize_ns: int = 0
    lqp_cache_hit: bool = False
    execute_ns: int = 0


_FAST_OPTIMIZER: Optional[Optimizer] = None


def execute_prepared(name: str, params, transaction_context=None,
                     use_mvcc: bool = True) -> Optional[Table]:
    """Direct prepared-statement execution — semantics of
    `EXECUTE name (...)` without re-parsing SQL text.  The OLTP hot path:
    TPC-C procedures spend ~10% of their wall time tokenizing EXECUTE
    statements whose literal parameters are already Python values (ref
    analogue: the server's extended protocol binds parameters straight
    into the cached plan, postgres_protocol_handler.hpp Bind/Execute)."""
    global _FAST_OPTIMIZER
    if _FAST_OPTIMIZER is None:
        _FAST_OPTIMIZER = Optimizer.create_default_optimizer()
    db = Database.get()
    plan = db.storage_manager.get_prepared_plan(name)
    inner = SQLPipelineStatement(
        f"EXECUTE {name}", plan.statement, use_mvcc, _FAST_OPTIMIZER,
        transaction_context, parameters=dict(enumerate(params)),
        use_cache=False,
    )
    inner._lqp = plan.lqp  # cids stable across EXECUTEs -> stage hits
    inner._execute()
    return inner._result


class SQLPipelineStatement:
    def __init__(
        self,
        sql: str,
        statement: st.Statement,
        use_mvcc: bool = True,
        optimizer: Optional[Optimizer] = None,
        transaction_context=None,
        parameters: Optional[Dict[int, object]] = None,
        use_cache: bool = True,
    ):
        self.sql = sql
        self.statement = statement
        self.use_mvcc = use_mvcc
        self.optimizer = optimizer or Optimizer.create_default_optimizer()
        self.transaction_context = transaction_context
        self.parameters = parameters or {}
        self.use_cache = use_cache
        self.metrics = SQLPipelineMetrics()
        self._lqp = None
        self._pqp = None
        self._result: Optional[Table] = None
        self._executed = False

    # ---------------------------------------------------------------- stages

    def get_optimized_logical_plan(self):
        if self._lqp is not None:
            return self._lqp
        db = Database.get()
        cache_key = (self.sql, self.use_mvcc)
        if self.use_cache and not self.parameters:
            cached = db.default_lqp_cache.try_get(cache_key)
            if cached is not None:
                self.metrics.lqp_cache_hit = True
                self._lqp = cached
                return cached
        t0 = time.perf_counter_ns()
        lqp = SQLTranslator(self.use_mvcc).translate(self.statement)
        self.metrics.translate_ns = time.perf_counter_ns() - t0
        t0 = time.perf_counter_ns()
        lqp = self.optimizer.optimize(lqp)
        self.metrics.optimize_ns = time.perf_counter_ns() - t0
        self._lqp = lqp
        if self.use_cache and not self.parameters and _is_cacheable(self.statement):
            db.default_lqp_cache.set(cache_key, lqp)
        return lqp

    def get_physical_plan(self):
        if self._pqp is not None:
            return self._pqp
        lqp = self.get_optimized_logical_plan()
        self._pqp = LQPTranslator().translate(lqp)
        return self._pqp

    def get_result_table(self) -> Optional[Table]:
        self._execute()
        return self._result

    # --------------------------------------------------------------- execute

    def _execute(self) -> None:
        if self._executed:
            return
        from hyrise_tpu.utils.runtime import statement_scope

        with statement_scope():
            self._execute_inner()

    def _execute_inner(self) -> None:
        db = Database.get()

        if isinstance(self.statement, st.TransactionStatement):
            raise RuntimeError("transaction statements are handled by SQLPipeline")
        if isinstance(self.statement, st.ShowStatement):
            self._result = self._execute_show()
            self._executed = True
            return
        if isinstance(self.statement, st.ExplainStatement):
            self._result = self._execute_explain()
            self._executed = True
            return
        if isinstance(self.statement, st.PrepareStatement):
            inner_stmt = self.statement.statement
            lqp = self.optimizer.optimize(
                SQLTranslator(self.use_mvcc).translate(inner_stmt)
            )
            db.storage_manager.add_prepared_plan(
                self.statement.name,
                PreparedPlan(lqp, None, statement=inner_stmt),
            )
            self._result = None
            self._executed = True
            return
        if isinstance(self.statement, st.ExecuteStatement):
            plan = db.storage_manager.get_prepared_plan(self.statement.name)
            params = {}
            for i, p in enumerate(self.statement.parameters):
                if isinstance(p, ast.Literal):
                    params[i] = p.value
                elif isinstance(p, ast.UnaryMinus) and isinstance(
                    p.children[0], ast.Literal
                ):
                    params[i] = -p.children[0].value
                else:
                    raise ValueError("EXECUTE parameters must be literals")
            inner = SQLPipelineStatement(
                self.sql, plan.statement, self.use_mvcc, self.optimizer,
                self.transaction_context, parameters=params, use_cache=False,
            )
            inner._lqp = plan.lqp  # cids stable across EXECUTEs -> stage hits
            inner._execute()
            self._result = inner._result
            self.metrics = inner.metrics
            self._executed = True
            return

        # distributed execution: sharded subtrees run on the mesh first,
        # re-entering the plan as static tables (parallel/dexec.py)
        lqp = self.get_optimized_logical_plan()
        sm = db.storage_manager
        if sm.has_sharded_tables() and not self.parameters:
            from hyrise_tpu.parallel.dexec import (
                references_sharded,
                rewrite_distributed,
            )

            from hyrise_tpu.plan import lqp as L

            for n in lqp.walk():
                if isinstance(
                    n, (L.InsertNode, L.UpdateNode, L.DeleteNode)
                ) and sm.is_sharded(n.table_name):
                    raise RuntimeError(
                        f"DML on distributed table {n.table_name!r} is not "
                        "supported — drop the sharded twin and re-distribute"
                    )
            if references_sharded(lqp, sm):
                t0 = time.perf_counter_ns()
                lqp = rewrite_distributed(lqp)
                self._pqp = LQPTranslator().translate(lqp)
                self.metrics.execute_ns += time.perf_counter_ns() - t0

        pqp = self.get_physical_plan()

        # transaction wiring: DML requires a context (auto-commit default)
        needs_txn = _is_dml(self.statement)
        ctx = self.transaction_context
        auto = False
        if ctx is None and (needs_txn or self.use_mvcc):
            ctx = db.transaction_manager.new_transaction_context(is_auto_commit=True)
            auto = True
        if ctx is not None:
            pqp.set_transaction_context_recursively(ctx)
        if self.parameters:
            _set_parameters(pqp, self.parameters)

        t0 = time.perf_counter_ns()
        tasks = OperatorTask.make_tasks_from_operator(pqp)
        try:
            db.scheduler.schedule_and_wait_for_tasks(tasks)
        except BaseException:
            # an auto-commit context must not leak: open transactions are
            # counted (runtime.transaction_begin) and the MVCC GC's
            # exclusive section waits for them to drain
            if auto and not ctx.aborted:
                ctx.rollback()
            raise
        self.metrics.execute_ns += time.perf_counter_ns() - t0

        if ctx is not None and ctx.aborted:
            ctx.rollback(after_conflict=True)
            raise TransactionConflict(
                "transaction conflict — rolled back; retry the transaction"
            )
        if auto and needs_txn:
            ctx.commit()
        elif auto:
            ctx._manager._deregister(ctx)  # read-only snapshot release
        self._result = pqp.get_output()
        self._executed = True

    def _execute_explain(self) -> Table:
        """EXPLAIN <stmt>: the optimized logical plan and the physical
        plan it translates to, one tree line per row (the SQL-surface
        counterpart of the console's `visualize`)."""
        inner = self.statement.statement
        lqp = self.optimizer.optimize(
            SQLTranslator(self.use_mvcc).translate(inner)
        )
        lines = ["-- optimized logical plan --"]
        lines += lqp.tree_string().splitlines()
        try:
            pqp = LQPTranslator().translate(lqp)
            lines.append("-- physical plan --")
            lines += pqp.description().splitlines()
        except Exception as exc:  # plans with DML/DDL side effects
            lines.append(f"-- physical plan unavailable: {exc} --")
        return Table.from_dict({"plan": lines})

    def _execute_show(self) -> Table:
        db = Database.get()
        if self.statement.what == "tables":
            return db.meta_table_manager.generate_table("meta_tables")
        table = db.storage_manager.get_table(self.statement.table_name)
        from hyrise_tpu.types import DataType

        return Table.from_dict(
            {
                "column_name": list(table.column_names),
                "data_type": [c.data_type.value for c in table.columns],
                "nullable": [int(c.validity is not None) for c in table.columns],
            },
            types={
                "column_name": DataType.STRING,
                "data_type": DataType.STRING,
                "nullable": DataType.INT,
            },
        )


class SQLPipeline:
    """Multi-statement pipeline (ref: sql_pipeline.hpp:36)."""

    def __init__(self, sql: str, use_mvcc: bool = True,
                 optimizer: Optional[Optimizer] = None,
                 transaction_context=None):
        self.sql = sql
        self.use_mvcc = use_mvcc
        self.optimizer = optimizer
        self.transaction_context = transaction_context
        t0 = time.perf_counter_ns()
        self.statements = parse_sql(sql)
        self.parse_ns = time.perf_counter_ns() - t0
        self._pipeline_statements: List[SQLPipelineStatement] = []

    def get_result_tables(self) -> List[Optional[Table]]:
        db = Database.get()
        results: List[Optional[Table]] = []
        ctx = self.transaction_context
        for stmt in self.statements:
            if isinstance(stmt, st.TransactionStatement):
                if stmt.command == "begin":
                    ctx = db.transaction_manager.new_transaction_context()
                elif stmt.command == "commit":
                    if ctx is not None:
                        ctx.commit()
                        ctx = None
                elif stmt.command == "rollback":
                    if ctx is not None:
                        ctx.rollback()
                        ctx = None
                results.append(None)
                continue
            ps = SQLPipelineStatement(
                self.sql,
                stmt,
                use_mvcc=self.use_mvcc,
                optimizer=self.optimizer,
                transaction_context=ctx,
            )
            ps.metrics.parse_ns = self.parse_ns
            self._pipeline_statements.append(ps)
            results.append(ps.get_result_table())
        self.transaction_context = ctx
        return results

    def get_result_table(self) -> Optional[Table]:
        return self.get_result_tables()[-1]

    @property
    def metrics(self) -> List[SQLPipelineMetrics]:
        return [ps.metrics for ps in self._pipeline_statements]


class SQLPipelineBuilder:
    """Ref: sql/sql_pipeline_builder.hpp:35."""

    def __init__(self, sql: str):
        self.sql = sql
        self._use_mvcc = True
        self._optimizer: Optional[Optimizer] = None
        self._transaction_context = None

    def disable_mvcc(self) -> "SQLPipelineBuilder":
        self._use_mvcc = False
        return self

    def with_optimizer(self, optimizer: Optimizer) -> "SQLPipelineBuilder":
        self._optimizer = optimizer
        return self

    def with_transaction_context(self, ctx) -> "SQLPipelineBuilder":
        self._transaction_context = ctx
        return self

    def create_pipeline(self) -> SQLPipeline:
        return SQLPipeline(
            self.sql,
            use_mvcc=self._use_mvcc,
            optimizer=self._optimizer,
            transaction_context=self._transaction_context,
        )


# --------------------------------------------------------------------- util


def sql(query: str) -> Optional[Table]:
    """One-shot convenience API."""
    return SQLPipelineBuilder(query).create_pipeline().get_result_table()


def _is_dml(stmt) -> bool:
    return isinstance(
        stmt, (st.InsertStatement, st.UpdateStatement, st.DeleteStatement)
    )


def _is_cacheable(stmt) -> bool:
    return isinstance(stmt, st.SelectStatement)


def _set_parameters(op, parameters) -> None:
    seen = set()

    def visit(o):
        if id(o) in seen:
            return
        seen.add(id(o))
        o.parameters = dict(parameters)
        for child in o.inputs():
            visit(child)
        for sub in o.uncorrelated_subquery_plans.values():
            visit(sub)

    visit(op)

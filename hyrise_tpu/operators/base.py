"""Physical operator base (ref: operators/abstract_operator.hpp:115 —
execute()/get_output() lifecycle, OperatorType enum :21-54, consumer
tracking :87-111, step-level OperatorPerformanceData).

Operators form a DAG; `execute()` assumes inputs are done (task scheduling
orders them) but will lazily execute them when driven directly.  Output
tables are compacted (valid rows at the front, padded capacity) so every
downstream kernel sees static shapes.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from hyrise_tpu.expression import ast
from hyrise_tpu.expression.evaluator import ExpressionEvaluator
from hyrise_tpu.kernels import masks
from hyrise_tpu.storage.table import Table
from hyrise_tpu.types import size_bucket

_SYNC_EXPENSIVE: Optional[bool] = None


def _sync_is_expensive() -> bool:
    """True on accelerator backends where a device->host count sync has a
    latency floor far above padded device work (tunnel RTT ~28ms)."""
    global _SYNC_EXPENSIVE
    if _SYNC_EXPENSIVE is None:
        import jax

        _SYNC_EXPENSIVE = jax.default_backend() != "cpu"
    return _SYNC_EXPENSIVE


@dataclass
class OperatorPerformanceData:
    """Ref: operators/operator_performance_data.hpp."""

    walltime_ns: int = 0
    output_rows: int = 0
    output_columns: int = 0
    step_runtimes: Dict[str, int] = field(default_factory=dict)
    executed: bool = False


class AbstractOperator:
    def __init__(self, left: Optional["AbstractOperator"] = None,
                 right: Optional["AbstractOperator"] = None):
        self._left = left
        self._right = right
        self._output: Optional[Table] = None
        self._executed = False
        self.performance_data = OperatorPerformanceData()
        self.transaction_context = None
        # uncorrelated subquery plans: subquery key -> root operator
        # (ref: abstract_operator + operator_task.cpp:63-99 wiring)
        self.uncorrelated_subquery_plans: Dict[tuple, "AbstractOperator"] = {}
        # Expressions describing this operator's output columns (set by the
        # LQP translator; TableWrapper/GetTable synthesize them).
        self.output_expressions: List[ast.Expression] = []
        # prepared-statement / correlated parameter bindings
        self.parameters: Dict[int, object] = {}

    # ---------------------------------------------------------------- wiring

    def inputs(self) -> List["AbstractOperator"]:
        return [op for op in (self._left, self._right) if op is not None]

    @property
    def left_input(self):
        return self._left

    @property
    def right_input(self):
        return self._right

    def uncorrelated_subquery_operators(self) -> List["AbstractOperator"]:
        return list(self.uncorrelated_subquery_plans.values())

    def set_transaction_context_recursively(self, ctx) -> None:
        self.transaction_context = ctx
        for op in self.inputs():
            op.set_transaction_context_recursively(ctx)
        for op in self.uncorrelated_subquery_plans.values():
            op.set_transaction_context_recursively(ctx)

    # --------------------------------------------------------------- execute

    def execute(self) -> None:
        if self._executed:
            return
        for op in self.inputs():
            op.execute()
        for op in self.uncorrelated_subquery_plans.values():
            op.execute()
        # materialize subquery results BEFORE _on_execute so evaluator
        # access inside jit-traced stages sees concrete arrays
        self._sub_results = {
            key: plan.get_output().materialize()
            for key, plan in self.uncorrelated_subquery_plans.items()
        }
        start = time.perf_counter_ns()
        self._output = self._on_execute()
        self.performance_data.walltime_ns = time.perf_counter_ns() - start
        if self._output is not None:
            self.performance_data.output_rows = self._output.num_rows
            self.performance_data.output_columns = self._output.num_columns
        self.performance_data.executed = True
        self._executed = True

    def get_output(self) -> Table:
        assert self._executed, f"{type(self).__name__} not executed"
        return self._output

    @property
    def executed(self) -> bool:
        return self._executed

    def _on_execute(self) -> Optional[Table]:
        raise NotImplementedError

    # --------------------------------------------------------------- helpers

    def input_table_left(self) -> Table:
        return self._left.get_output()

    def input_table_right(self) -> Table:
        return self._right.get_output()

    def _column_map(self, op: "AbstractOperator") -> Dict[tuple, int]:
        """expression key -> physical column index of op's output."""
        return {e.key(): i for i, e in enumerate(op.output_expressions)}

    def make_evaluator(self, table: Table, column_map: Dict[tuple, int],
                       parameters=None, sub_results=None) -> ExpressionEvaluator:
        if sub_results is None:
            sub_results = getattr(self, "_sub_results", None)
        if sub_results is None:
            sub_results = {
                key: plan.get_output().materialize()
                for key, plan in self.uncorrelated_subquery_plans.items()
            }
        return ExpressionEvaluator(
            table, column_map, sub_results,
            parameters if parameters is not None else self.parameters,
        )

    def description(self, indent: int = 0) -> str:
        pad = " " * indent
        lines = [f"{pad}{self._describe_self()}"]
        for op in self.inputs():
            lines.append(op.description(indent + 2))
        return "\n".join(lines)

    def _describe_self(self) -> str:
        return type(self).__name__

    # ------------------------------------------------------------ compaction

    @staticmethod
    def maybe_compact(table: Table, shrink_factor: int = 4,
                      est_rows: Optional[float] = None) -> Table:
        """Materialize a deferred selection when that is cheaper than
        operating on the padded table.  The trade is backend-dependent:

        - CPU: a count sync is free, padded sorts cost real time ->
          count, and compact when rows << capacity (the original policy);
        - accelerators (esp. through a remote tunnel): every count sync
          has a ~10-30ms latency floor while a padded device sort at
          bench capacities costs <1ms (ROOFLINE_TPU.json: 4M-row sort =
          0.08ms) -> never sync just to decide; compact only when the
          OPTIMIZER ESTIMATE alone proves extreme sparsity at a capacity
          where padded work approaches the sync cost."""
        if table.selection is None or table.capacity <= 256:
            return table
        from hyrise_tpu.types import size_bucket

        if _sync_is_expensive():
            # 4x estimated shrink at >=4M capacity already pays: the
            # consumers are O(n log n) sorts and multi-pass cumsums whose
            # per-row cost dwarfs the one ~25 ms count sync (SF1 Q20's
            # aggregate ran 1.1 s at 8M capacity where 1M slots sufficed;
            # the previous 16x headroom never fired on that shape)
            if (
                table.capacity >= (1 << 22)
                and est_rows is not None and est_rows > 0
                and size_bucket(max(int(est_rows), 1)) * 4 <= table.capacity
            ):
                n = table.valid_count  # big payoff: pay the one sync
                if size_bucket(max(n, 1)) * shrink_factor <= table.capacity:
                    return table.materialize()
            return table
        if est_rows is not None and est_rows > 0:
            # skip the sync only when the estimate says ESSENTIALLY FULL:
            # a wasted sync costs ~1-30ms, a wasted full-capacity sort
            # costs seconds on CPU — bias toward syncing
            if size_bucket(max(int(est_rows), 1)) >= table.capacity:
                return table
        n = table.valid_count
        if size_bucket(max(n, 1)) * shrink_factor <= table.capacity:
            return table.materialize()
        return table

    def input_estimated_rows(self, which: str = "left") -> Optional[float]:
        op = self._left if which == "left" else self._right
        return getattr(op, "estimated_rows", None) if op is not None else None

    @staticmethod
    def compact(table: Table, mask: jnp.ndarray, count: Optional[int] = None) -> Table:
        """Gather rows where mask is True into a fresh compacted table.
        One host sync for the row count (bucketed to limit recompiles)."""
        if count is None:
            count = int(masks.mask_count(mask))
        cap = size_bucket(count)
        if cap > mask.shape[0]:
            cap = mask.shape[0]
        idx = masks.mask_to_indices(mask, cap)
        return table.take(idx, count)


class AbstractReadOnlyOperator(AbstractOperator):
    pass


class AbstractReadWriteOperator(AbstractOperator):
    """Ref: abstract_read_write_operator.hpp — operators that modify data
    register with the transaction context and implement commit/rollback."""

    def __init__(self, left=None, right=None):
        super().__init__(left, right)
        self.failed = False

    def execute(self) -> None:
        assert self.transaction_context is not None, (
            f"{type(self).__name__} requires a transaction context"
        )
        self.transaction_context.register_read_write_operator(self)
        super().execute()

    def commit_records(self, commit_id: int) -> None:
        raise NotImplementedError

    def rollback_records(self) -> None:
        raise NotImplementedError

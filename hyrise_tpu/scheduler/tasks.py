"""Task DAG primitives (ref: scheduler/abstract_task.hpp:78,
operator_task.hpp:17, job_task.hpp:33).

Tasks carry predecessor/successor edges (abstract_task.hpp:129-139) and move
through Created -> Scheduled -> Started -> Done (states trimmed vs the
reference since enqueueing is delegated to Python executors)."""

from __future__ import annotations

import enum
import itertools
import threading
from typing import Callable, List, Optional


class TaskState(enum.Enum):
    CREATED = 0
    SCHEDULED = 1
    STARTED = 2
    DONE = 3


_task_ids = itertools.count()


class AbstractTask:
    def __init__(self, description: str = ""):
        self.id = next(_task_ids)
        self.description = description
        self.predecessors: List["AbstractTask"] = []
        self.successors: List["AbstractTask"] = []
        self.state = TaskState.CREATED
        self._done_event = threading.Event()
        self._done_callbacks: List[Callable[[], None]] = []
        self._pending_predecessors = 0
        self._lock = threading.Lock()
        self.exception: Optional[BaseException] = None
        self.node_id: int = 0  # preferred topology node (NUMA analogue)

    def set_as_predecessor_of(self, successor: "AbstractTask") -> None:
        self.successors.append(successor)
        successor.predecessors.append(self)

    @property
    def is_done(self) -> bool:
        return self._done_event.is_set()

    def is_ready(self) -> bool:
        return all(p.is_done for p in self.predecessors)

    def on_done(self, callback: Callable[[], None]) -> None:
        with self._lock:
            if self.is_done:
                run_now = True
            else:
                self._done_callbacks.append(callback)
                run_now = False
        if run_now:
            callback()

    def join(self) -> None:
        self._done_event.wait()
        if self.exception is not None:
            raise self.exception

    def execute(self) -> None:
        self.state = TaskState.STARTED
        try:
            self._on_execute()
        except BaseException as exc:  # propagate to join()ers
            self.exception = exc
        finally:
            self.state = TaskState.DONE
            with self._lock:
                callbacks = list(self._done_callbacks)
                self._done_callbacks.clear()
                self._done_event.set()
            for cb in callbacks:
                cb()

    def _on_execute(self) -> None:
        raise NotImplementedError


class JobTask(AbstractTask):
    """Ad-hoc lambda task for intra-operator parallelism (ref: job_task.hpp:33)."""

    def __init__(self, fn: Callable[[], None], description: str = "job"):
        super().__init__(description)
        self._fn = fn
        self.result = None

    def _on_execute(self) -> None:
        self.result = self._fn()


class OperatorTask(AbstractTask):
    """Wraps a physical operator (ref: operator_task.hpp:17)."""

    def __init__(self, op, description: str = ""):
        super().__init__(description or type(op).__name__)
        self.op = op

    def _on_execute(self) -> None:
        self.op.execute()

    @staticmethod
    def make_tasks_from_operator(root_op) -> List["OperatorTask"]:
        """PQP DAG -> task DAG, deduplicating shared subplans and wiring
        uncorrelated subquery plans (ref: operator_task.cpp:28-118)."""
        op_to_task = {}
        ordered: List[OperatorTask] = []

        def visit(op):
            if id(op) in op_to_task:
                return op_to_task[id(op)]
            task = OperatorTask(op)
            op_to_task[id(op)] = task
            for child in op.inputs():
                child_task = visit(child)
                child_task.set_as_predecessor_of(task)
            for sub in op.uncorrelated_subquery_operators():
                sub_task = visit(sub)
                sub_task.set_as_predecessor_of(task)
            ordered.append(task)  # postorder => topological
            return task

        visit(root_op)
        return ordered

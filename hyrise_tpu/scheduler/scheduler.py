"""Schedulers (ref: scheduler/abstract_scheduler.hpp:56,
node_queue_scheduler.hpp:76, immediate_execution_scheduler.hpp:14).

The reference runs one worker thread per CPU with per-NUMA-node queues and
work stealing.  Here the data plane executes on the accelerator through XLA
(which schedules on-chip itself); the host-side scheduler's job is (a)
dependency-ordered dispatch of operator stages, (b) overlapping host work
(parse/optimize/IO) across queries, and (c) multi-query concurrency.  JAX
releases the GIL during device execution, so a thread pool still pipelines.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, List, Optional, Sequence

from hyrise_tpu.scheduler.tasks import AbstractTask, TaskState
from hyrise_tpu.scheduler.topology import Topology


class AbstractScheduler:
    def schedule(self, task: AbstractTask) -> None:
        raise NotImplementedError

    def schedule_tasks(self, tasks: Sequence[AbstractTask]) -> None:
        for t in tasks:
            self.schedule(t)

    def wait_for_tasks(self, tasks: Sequence[AbstractTask]) -> None:
        for t in tasks:
            t.join()

    def schedule_and_wait_for_tasks(self, tasks: Sequence[AbstractTask]) -> None:
        self.schedule_tasks(tasks)
        self.wait_for_tasks(tasks)

    def finish(self) -> None:
        pass


class ImmediateExecutionScheduler(AbstractScheduler):
    """Synchronous, single-threaded (the default; ref:
    immediate_execution_scheduler.hpp:14)."""

    def schedule(self, task: AbstractTask) -> None:
        task.state = TaskState.SCHEDULED
        # Execute as soon as predecessors are done; with synchronous
        # scheduling and topologically-ordered task lists this is immediate.
        if task.is_ready():
            task.execute()
        else:
            remaining = [p for p in task.predecessors if not p.is_done]

            def maybe_run():
                if task.is_ready() and task.state != TaskState.DONE and task.state != TaskState.STARTED:
                    task.execute()

            for p in remaining:
                p.on_done(maybe_run)


class NodeQueueScheduler(AbstractScheduler):
    """Multi-threaded scheduler: a queue per topology node, a worker thread
    per CPU, work stealing from remote queues (ref:
    node_queue_scheduler.hpp:76, worker.cpp:91-98)."""

    def __init__(self, topology: Optional[Topology] = None):
        self.topology = topology or Topology.use_default_topology()
        self._queues: List[queue.SimpleQueue] = [
            queue.SimpleQueue() for _ in self.topology.nodes
        ]
        self._shutdown = threading.Event()
        self._threads: List[threading.Thread] = []
        self._lock = threading.Lock()
        for node in self.topology.nodes:
            for cpu in node.cpu_ids:
                t = threading.Thread(
                    target=self._worker_loop,
                    args=(node.node_id,),
                    name=f"worker-n{node.node_id}-c{cpu}",
                    daemon=True,
                )
                t.start()
                self._threads.append(t)

    def schedule(self, task: AbstractTask) -> None:
        task.state = TaskState.SCHEDULED
        if task.is_ready():
            self._enqueue(task)
        else:
            pending = [p for p in task.predecessors if not p.is_done]
            counter = {"n": len(pending)}
            lock = threading.Lock()

            def dep_done():
                with lock:
                    counter["n"] -= 1
                    ready = counter["n"] == 0
                if ready:
                    self._enqueue(task)

            # on_done runs immediately if already done, so recount safely.
            for p in pending:
                p.on_done(dep_done)

    def _enqueue(self, task: AbstractTask) -> None:
        node = task.node_id if task.node_id < len(self._queues) else 0
        self._queues[node].put(task)

    def _worker_loop(self, node_id: int) -> None:
        my_queue = self._queues[node_id]
        while not self._shutdown.is_set():
            task = None
            try:
                task = my_queue.get(timeout=0.05)
            except queue.Empty:
                #

                # Work stealing: scan remote queues (ref: worker.cpp:91-98).
                for i, q in enumerate(self._queues):
                    if i == node_id:
                        continue
                    try:
                        task = q.get_nowait()
                        break
                    except queue.Empty:
                        continue
            if task is not None:
                task.execute()

    def finish(self) -> None:
        self._shutdown.set()
        me = threading.current_thread()
        for t in self._threads:
            # a scheduler swap can be triggered FROM a worker (UPDATE
            # meta_settings executes as a task) — never join ourselves
            if t is not me:
                t.join(timeout=1.0)
        self._threads.clear()

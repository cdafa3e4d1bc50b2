from hyrise_tpu.scheduler.tasks import AbstractTask, JobTask, OperatorTask
from hyrise_tpu.scheduler.scheduler import (
    AbstractScheduler,
    ImmediateExecutionScheduler,
    NodeQueueScheduler,
)
from hyrise_tpu.scheduler.topology import Topology

__all__ = [
    "AbstractTask",
    "JobTask",
    "OperatorTask",
    "AbstractScheduler",
    "ImmediateExecutionScheduler",
    "NodeQueueScheduler",
    "Topology",
]

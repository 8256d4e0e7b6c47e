"""Task/DAG orchestration.

Reference parity: orchestration/dag.py — Task with retries +
retry_delay (:20-118), DAG with Kahn topological sort (:146-181),
dependency gating (:56-66), stop-on-first-failure execution (:183-244).

Pure driver-side Python (no Spark involvement) — orchestration is
control flow, the jobs it runs are Spark."""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, Optional


class TaskStatus(str, Enum):
    PENDING = "pending"
    RUNNING = "running"
    SUCCESS = "success"
    FAILED = "failed"
    SKIPPED = "skipped"


@dataclass
class Task:
    name: str
    fn: Callable[[], dict | None]
    depends_on: list[str] = field(default_factory=list)
    retries: int = 0
    retry_delay_seconds: float = 0.0
    status: TaskStatus = TaskStatus.PENDING
    result: Optional[dict] = None
    error: Optional[str] = None
    attempts: int = 0

    def execute(self) -> bool:
        self.status = TaskStatus.RUNNING
        attempt = 0
        while True:
            attempt += 1
            self.attempts = attempt
            try:
                self.result = self.fn() or {}
                self.status = TaskStatus.SUCCESS
                return True
            except Exception as e:  # retry with delay (dag.py:68-118)
                self.error = str(e)
                if attempt > self.retries:
                    self.status = TaskStatus.FAILED
                    return False
                if self.retry_delay_seconds:
                    time.sleep(self.retry_delay_seconds)


class DAG:
    def __init__(self, name: str):
        self.name = name
        self.tasks: dict[str, Task] = {}

    def add_task(self, task: Task) -> None:
        if task.name in self.tasks:
            raise ValueError(f"duplicate task {task.name}")
        self.tasks[task.name] = task

    def topological_order(self) -> list[str]:
        """Kahn's algorithm (orchestration/dag.py:146-181)."""
        indeg = {n: 0 for n in self.tasks}
        for t in self.tasks.values():
            for dep in t.depends_on:
                if dep not in self.tasks:
                    raise ValueError(f"unknown dependency {dep} of {t.name}")
                indeg[t.name] += 1
        queue = sorted(n for n, d in indeg.items() if d == 0)
        order: list[str] = []
        while queue:
            n = queue.pop(0)
            order.append(n)
            for t in self.tasks.values():
                if n in t.depends_on:
                    indeg[t.name] -= 1
                    if indeg[t.name] == 0:
                        queue.append(t.name)
            queue.sort()
        if len(order) != len(self.tasks):
            raise ValueError("cycle detected in DAG")
        return order

    def execute(self, stop_on_failure: bool = True) -> dict:
        """Run in topo order; gate on dependency success; stop on first
        failure (orchestration/dag.py:183-244)."""
        start = time.time()
        failed = False
        for name in self.topological_order():
            task = self.tasks[name]
            deps_ok = all(
                self.tasks[d].status == TaskStatus.SUCCESS for d in task.depends_on
            )
            if failed or not deps_ok:
                task.status = TaskStatus.SKIPPED
                continue
            ok = task.execute()
            if not ok and stop_on_failure:
                failed = True
        statuses = {n: t.status.value for n, t in self.tasks.items()}
        return {
            "dag": self.name,
            "duration_seconds": time.time() - start,
            "success": all(t.status == TaskStatus.SUCCESS for t in self.tasks.values()),
            "tasks": statuses,
        }

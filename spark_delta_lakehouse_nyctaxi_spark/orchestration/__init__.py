from .dag import DAG, Task, TaskStatus

__all__ = ["DAG", "Task", "TaskStatus"]

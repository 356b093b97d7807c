#!/usr/bin/env python
"""Pipeline alerting walk: declare the reference-style ``monitoring``
block next to the task graph, run the pipeline, and evaluate the alert
rules over what actually happened (monitoring.py — the declared
semantics of the reference's config/pipelines/sample_pipeline.yaml
alert_rules, which its own codebase never implemented).

Three rule types fire from one run:

1. ``task_failed``            — the flaky extract exhausts its retries;
2. ``validation_warning``     — the validate task returns a report
                                carrying warnings (stale rows);
3. ``task_duration > 0.2``    — the slow transform trips a (demo-tight)
                                duration bound.

Downstream tasks go UPSTREAM_FAILED and deliberately do NOT page —
one broken task, one page.

Run:  python examples/pipeline_alerting_example.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import yaml  # noqa: E402

from data_pipeline_for_real_time_retail_analytics_spark.monitoring import (  # noqa: E402
    alerts_for_run,
)
from data_pipeline_for_real_time_retail_analytics_spark.orchestrate import (  # noqa: E402
    TaskConfig,
    TaskGraph,
)

SPEC = yaml.safe_load(
    """
monitoring:
  alert_channels:
    - email: data-team@example.com
  alert_rules:
    - name: pipeline_failure
      condition: task_failed
      severity: critical
    - name: data_quality_warning
      condition: validation_warning
      severity: warning
    - name: long_running_task
      condition: task_duration > 0.2
      severity: warning
"""
)


class _Report:
    def __init__(self, warnings):
        self.warnings = warnings


def extract_flaky(**_):
    raise ConnectionError("source db unreachable")


def extract_ok(**_):
    return {"rows": 1200}


def validate(**_):
    return _Report([
        {"rule": "freshness", "affected_rows": 37},
        {"rule": "null_ratio", "affected_rows": 4},
    ])


def transform_slow(**_):
    time.sleep(0.25)
    return {"rows": 1150}


def main() -> None:
    graph = TaskGraph([
        TaskConfig("extract_orders", fn=extract_flaky, max_retries=1,
                   retry_delay=0.01),
        TaskConfig("extract_events", fn=extract_ok),
        TaskConfig("validate_events", fn=validate,
                   depends_on=["extract_events"]),
        TaskConfig("transform_events", fn=transform_slow,
                   depends_on=["validate_events"]),
        TaskConfig("load_orders", depends_on=["extract_orders"]),
    ])
    results = graph.run()

    print("== task states ==")
    for tid, res in sorted(results.items()):
        print(f"  {tid:18s} {res.state.name:16s} "
              f"attempts={res.attempts} {res.elapsed:.2f}s")

    alerts = alerts_for_run(SPEC, results)
    print(f"\n== alerts ({len(alerts)}) ==")
    for a in alerts:
        print(f"  [{a.severity.upper():8s}] {a.rule:22s} "
              f"task={a.task_id}: {a.message}")

    paged = {a.task_id for a in alerts if a.rule == "pipeline_failure"}
    assert paged == {"extract_orders"}, (
        "UPSTREAM_FAILED must not page — one broken task, one page"
    )
    print("\nload_orders went UPSTREAM_FAILED and did not page: OK")


if __name__ == "__main__":
    main()

"""Orchestrator tests — topo levels, cycle detection, the seven trigger
rules, retry/backoff, schedules, and a YAML pipeline end-to-end on Spark
(mirrors the reference's integration suite,
tests/integration/test_airflow_orchestration.py:186-358)."""

from datetime import datetime

import pytest
import yaml

from data_pipeline_for_real_time_retail_analytics_spark.orchestrate import (
    CycleError,
    Schedule,
    TaskConfig,
    TaskGraph,
    TaskState,
    TriggerRule,
    build_pipeline,
    cron_matches,
    next_cron_fire,
    parse_interval,
    sql_model_runner,
)


def _graph(*tasks):
    return TaskGraph(tasks)


def test_topo_levels_group_independent_tasks():
    g = _graph(
        TaskConfig("a"),
        TaskConfig("b"),
        TaskConfig("c", depends_on=["a", "b"]),
        TaskConfig("d", depends_on=["c"]),
    )
    assert g.levels() == [["a", "b"], ["c"], ["d"]]


def test_priority_orders_within_level():
    g = _graph(TaskConfig("low", priority=1), TaskConfig("high", priority=9))
    assert g.levels()[0] == ["high", "low"]


def test_cycle_detection():
    with pytest.raises(CycleError):
        _graph(TaskConfig("a", depends_on=["b"]), TaskConfig("b", depends_on=["a"]))


def test_unknown_dependency_rejected():
    with pytest.raises(ValueError):
        _graph(TaskConfig("a", depends_on=["ghost"]))


def _fail(**_):
    raise RuntimeError("boom")


def _ok(**_):
    return 42


def test_all_success_skips_after_failure():
    g = _graph(
        TaskConfig("a", fn=_fail),
        TaskConfig("b", fn=_ok, depends_on=["a"]),  # default all_success
        TaskConfig("c", fn=_ok, depends_on=["b"]),
    )
    r = g.run()
    assert r["a"].state is TaskState.FAILED
    assert r["b"].state is TaskState.UPSTREAM_FAILED
    assert r["c"].state is TaskState.UPSTREAM_FAILED


@pytest.mark.parametrize(
    "rule,expected",
    [
        (TriggerRule.ALL_SUCCESS, TaskState.UPSTREAM_FAILED),
        (TriggerRule.ALL_FAILED, TaskState.SKIPPED),
        (TriggerRule.ALL_DONE, TaskState.SUCCESS),
        (TriggerRule.ONE_SUCCESS, TaskState.SUCCESS),
        (TriggerRule.ONE_FAILED, TaskState.SUCCESS),
        (TriggerRule.NONE_FAILED, TaskState.UPSTREAM_FAILED),
        (TriggerRule.NONE_SKIPPED, TaskState.SUCCESS),
    ],
)
def test_trigger_rules_mixed_upstream(rule, expected):
    """One success + one failure upstream — each rule's documented verdict."""
    g = _graph(
        TaskConfig("ok", fn=_ok),
        TaskConfig("bad", fn=_fail),
        TaskConfig("t", fn=_ok, depends_on=["ok", "bad"], trigger_rule=rule),
    )
    assert g.run()["t"].state is expected


def test_all_failed_runs_when_every_upstream_failed():
    g = _graph(
        TaskConfig("x", fn=_fail),
        TaskConfig("y", fn=_fail),
        TaskConfig("cleanup", fn=_ok, depends_on=["x", "y"],
                   trigger_rule=TriggerRule.ALL_FAILED),
    )
    assert g.run()["cleanup"].state is TaskState.SUCCESS


def test_retry_then_succeed():
    calls = {"n": 0}

    def flaky(**_):
        calls["n"] += 1
        if calls["n"] < 3:
            raise TimeoutError("transient")
        return "done"

    g = _graph(TaskConfig("f", fn=flaky, max_retries=3, retry_delay=0.001))
    r = g.run()["f"]
    assert r.state is TaskState.SUCCESS and r.attempts == 3 and r.value == "done"


def test_retries_exhausted():
    g = _graph(TaskConfig("f", fn=_fail, max_retries=2, retry_delay=0.001))
    r = g.run()["f"]
    assert r.state is TaskState.FAILED and r.attempts == 3
    assert "boom" in r.error


def test_parse_interval():
    assert parse_interval("30m").total_seconds() == 1800
    assert parse_interval("1h").total_seconds() == 3600
    assert parse_interval("2d").total_seconds() == 172800
    with pytest.raises(ValueError):
        parse_interval("soon")


def test_cron_matching():
    assert cron_matches("*/15 9-17 * * 1-5", datetime(2026, 8, 12, 9, 30))  # Wed
    assert not cron_matches("*/15 9-17 * * 1-5", datetime(2026, 8, 16, 9, 30))  # Sun
    assert cron_matches("0 0 1 1 *", datetime(2026, 1, 1, 0, 0))
    nxt = next_cron_fire("30 2 * * *", datetime(2026, 8, 12, 3, 0))
    assert nxt == datetime(2026, 8, 13, 2, 30)


def test_schedule_kinds():
    t0 = datetime(2026, 8, 12, 12, 0)
    assert Schedule("interval", "1h").next_run(t0) == datetime(2026, 8, 12, 13, 0)
    assert Schedule("manual").next_run(t0) is None
    assert Schedule("cron", "0 * * * *").next_run(t0) == datetime(2026, 8, 12, 13, 0)


PIPELINE_YAML = """
name: retail_mini
tasks:
  - id: staging_orders_model
    type: sql_model
    params:
      model: t_staging_orders
      sql: >-
        SELECT o_orderkey AS order_id, o_custkey AS customer_id,
               o_totalprice AS total_amount
        FROM orders_src WHERE o_totalprice >= 0
  - id: mart_revenue
    type: sql_model
    depends_on: [staging_orders_model]
    params:
      model: t_mart_revenue
      sql: >-
        SELECT customer_id, SUM(total_amount) AS revenue
        FROM t_staging_orders GROUP BY customer_id
  - id: validate_mart
    type: sql_check
    depends_on: [mart_revenue]
    params:
      sql: SELECT COUNT(*) FROM t_mart_revenue WHERE revenue < 0
      expect: 0
"""


def test_yaml_pipeline_end_to_end(spark, sf_dir):
    from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_src")
    spec = yaml.safe_load(PIPELINE_YAML)

    def sql_check(sql, expect, **_):
        got = spark.sql(sql).first()[0]
        if got != expect:
            raise AssertionError(f"check failed: {got} != {expect}")
        return got

    g = build_pipeline(
        spec, {"sql_model": sql_model_runner(spark), "sql_check": sql_check}
    )
    results = g.run()
    assert all(r.state is TaskState.SUCCESS for r in results.values())
    assert spark.table("t_mart_revenue").count() > 0

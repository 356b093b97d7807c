"""Incremental aggregate maintenance (operators/aggmaint.py): the
rolled-forward aggregate must equal a full re-aggregation of the new
snapshot, including group births, moves, and deaths. DuckDB parity for
the registry-ready query rides tests/test_snapshotq.py.
"""

import os
from decimal import Decimal

import pytest

from data_pipeline_for_real_time_retail_analytics_spark.operators.aggmaint import (
    aggregate_snapshot,
    apply_changelog_to_agg,
    changelog_with_preimage,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import snapshotq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _rows_by_key(df, *keys):
    return {tuple(r[k] for k in keys): r.asDict() for r in df.collect()}


def test_rolled_aggregate_equals_recompute_on_orders(spark):
    """End-to-end on the synthetic snapshots: old_agg ⊕ changelog ==
    aggregate_snapshot(new), value for value."""
    old, new = snapshotq._snapshots(spark, SF_DIR, with_price=True)
    spec = {"total_price": "o_totalprice"}
    old_agg = aggregate_snapshot(old, ["o_orderpriority"], spec)
    changelog = changelog_with_preimage(
        old, new, ["o_orderkey"], ["o_orderpriority", "o_totalprice"]
    )
    rolled = apply_changelog_to_agg(
        old_agg, changelog, ["o_orderpriority"], spec
    )
    direct = aggregate_snapshot(new, ["o_orderpriority"], spec)
    r, d = _rows_by_key(rolled, "o_orderpriority"), _rows_by_key(
        direct, "o_orderpriority"
    )
    assert set(r) == set(d)
    for k in d:
        assert r[k]["n_rows"] == d[k]["n_rows"], k
        assert r[k]["total_price"] == d[k]["total_price"], k
    # the rewritten-priority group exists only in the NEW snapshot —
    # maintenance had to create it from update contributions alone
    assert (snapshotq.UPDATED_PRIORITY,) in r


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, g, Decimal(v)) for k, g, v in rows], "id int, grp string, v decimal(10,2)"
    )


def test_group_birth_move_and_death(spark):
    """old: grp a={1,2}, b={3}.  new: row 2 moves a→c (birth), row 3
    deleted (b dies), row 4 inserted into a."""
    old = _df(spark, [(1, "a", "1.00"), (2, "a", "2.00"), (3, "b", "5.00")])
    new = _df(spark, [(1, "a", "1.00"), (2, "c", "2.50"), (4, "a", "4.00")])
    spec = {"total": "v"}
    old_agg = aggregate_snapshot(old, ["grp"], spec)
    changelog = changelog_with_preimage(old, new, ["id"], ["grp", "v"])
    rolled = _rows_by_key(
        apply_changelog_to_agg(old_agg, changelog, ["grp"], spec), "grp"
    )
    assert set(rolled) == {("a",), ("c",)}, "group b must die, c must be born"
    assert rolled[("a",)]["n_rows"] == 2
    assert rolled[("a",)]["total"] == Decimal("5.00")
    assert rolled[("c",)]["n_rows"] == 1
    assert rolled[("c",)]["total"] == Decimal("2.50")


def test_null_group_is_one_group(spark):
    """A NULL-valued grouping attribute is ONE group to groupBy, so the
    merge must match it null-safely — plain equality would emit two
    never-matching NULL-group rows (the review finding this pins)."""
    old = spark.createDataFrame(
        [(1, None, Decimal("1.00")), (2, None, Decimal("2.00")),
         (3, "a", Decimal("5.00"))],
        "id int, grp string, v decimal(10,2)",
    )
    new = spark.createDataFrame(
        [(1, None, Decimal("1.00")), (3, "a", Decimal("5.00")),
         (4, None, Decimal("9.00"))],
        "id int, grp string, v decimal(10,2)",
    )
    spec = {"total": "v"}
    rolled = _rows_by_key(
        apply_changelog_to_agg(
            aggregate_snapshot(old, ["grp"], spec),
            changelog_with_preimage(old, new, ["id"], ["grp", "v"]),
            ["grp"],
            spec,
        ),
        "grp",
    )
    direct = _rows_by_key(aggregate_snapshot(new, ["grp"], spec), "grp")
    assert rolled == direct
    assert rolled[(None,)]["n_rows"] == 2
    assert rolled[(None,)]["total"] == Decimal("10.00")


def test_null_safe_keys_opt_in(spark):
    """Mirrors snapshot_diff's contract: a NULL-keyed row churns as
    delete+insert under plain equality, and is quiet under
    null_safe_keys=True when unchanged."""
    rows = [(None, "a", Decimal("1.00")), (7, "b", Decimal("2.00"))]
    old = spark.createDataFrame(rows, "id int, grp string, v decimal(10,2)")
    new = spark.createDataFrame(rows, "id int, grp string, v decimal(10,2)")
    churn = changelog_with_preimage(old, new, ["id"], ["grp", "v"]).collect()
    assert {r.op for r in churn} == {"insert", "delete"}
    quiet = changelog_with_preimage(
        old, new, ["id"], ["grp", "v"], null_safe_keys=True
    ).collect()
    assert quiet == []


def test_changelog_images(spark):
    old = _df(spark, [(1, "a", "1.00"), (2, "a", "2.00"), (3, "b", "5.00")])
    new = _df(spark, [(1, "a", "1.00"), (2, "c", "2.50"), (4, "a", "4.00")])
    cl = _rows_by_key(
        changelog_with_preimage(old, new, ["id"], ["grp", "v"]), "id"
    )
    assert set(cl) == {(2,), (3,), (4,)}, "unchanged row 1 must be absent"
    assert cl[(2,)]["op"] == "update"
    assert (cl[(2,)]["old_grp"], cl[(2,)]["new_grp"]) == ("a", "c")
    assert cl[(3,)]["op"] == "delete"
    assert cl[(3,)]["new_grp"] is None and cl[(3,)]["old_grp"] == "b"
    assert cl[(4,)]["op"] == "insert"
    assert cl[(4,)]["old_grp"] is None and cl[(4,)]["new_grp"] == "a"


def test_single_changelog_scan(spark):
    """The contribution explode must read the changelog ONCE (a
    where/union formulation duplicates the whole deriving subtree):
    the plan tree holds exactly one Generate and three parquet scans —
    old_agg's, plus the changelog's old and new sides."""
    df = snapshotq.q_orders_agg_maintenance(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree = plan.split("\n\n")[0]
    assert tree.count("Generate") == 1
    assert tree.count("Scan parquet") == 3
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_null_measures_roll_to_null_not_zero(spark):
    """NULL-measure contract (module docstring; r8 verdict finding #3):
    a NULL measure contributes nothing, and a group with ZERO non-null
    contributions must roll forward to SUM's answer, NULL — never 0.
    The maintained ``nn_<out>`` counts are what make that decidable, so
    rolled == recomputed is pinned literally, NULL cells included, over
    every transition: stays-all-NULL, last-non-null-deleted (revert to
    NULL), and first-non-null-inserted (NULL group comes alive)."""

    def _ndf(rows):
        return spark.createDataFrame(
            [(k, g, None if v is None else Decimal(v)) for k, g, v in rows],
            "id int, grp string, v decimal(10,2)",
        )

    # a: all-NULL group, unchanged row + a NULL insert (stays NULL)
    # b: its only non-null row is deleted (2.00 → NULL, not 0.00)
    # c: all-NULL group gains its first non-null value (NULL → 7.00)
    old = _ndf([(1, "a", None), (2, "b", "2.00"), (3, "b", None),
                (4, "c", None)])
    new = _ndf([(1, "a", None), (5, "a", None), (3, "b", None),
                (4, "c", None), (6, "c", "7.00")])
    spec = {"total_v": "v"}
    old_agg = aggregate_snapshot(old, ["grp"], spec)
    changelog = changelog_with_preimage(old, new, ["id"], ["grp", "v"])
    rolled = _rows_by_key(
        apply_changelog_to_agg(old_agg, changelog, ["grp"], spec), "grp"
    )
    direct = _rows_by_key(aggregate_snapshot(new, ["grp"], spec), "grp")
    assert rolled == direct
    assert rolled[("a",)]["total_v"] is None
    assert rolled[("a",)]["nn_total_v"] == 0
    assert rolled[("b",)]["total_v"] is None, "revert-to-NULL, not 0"
    assert rolled[("b",)]["n_rows"] == 1
    assert rolled[("c",)]["total_v"] == Decimal("7.00")
    assert rolled[("c",)]["nn_total_v"] == 1


def test_empty_specs_rejected(spark):
    df = _df(spark, [(1, "a", "1.00")])
    with pytest.raises(ValueError):
        changelog_with_preimage(df, df, [], ["v"])
    with pytest.raises(ValueError):
        changelog_with_preimage(df, df, ["id"], [])


def test_legacy_baseline_without_nn_cols_rejected(spark):
    """A baseline persisted by the pre-r9 aggregate_snapshot (no
    nn_<out> non-null counts) must fail with the rebuild instruction,
    not an unresolvable-column analysis error (r9 advice)."""
    old = _df(spark, [(1, "a", "1.00"), (2, "b", "2.00")])
    new = _df(spark, [(1, "a", "3.00"), (2, "b", "2.00")])
    spec = {"total_v": "v"}
    legacy = aggregate_snapshot(old, ["grp"], spec).drop("nn_total_v")
    changelog = changelog_with_preimage(old, new, ["id"], ["grp", "v"])
    with pytest.raises(ValueError, match="pre-nn_<out>.*Rebuild"):
        apply_changelog_to_agg(legacy, changelog, ["grp"], spec)

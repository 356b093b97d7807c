#!/usr/bin/env python
"""Batch-CDC walk: diff two warehouse snapshots → changelog → roll the
old snapshot forward → SCD-2 history of the changed keys.

The reference detects changes by probing LIVE sources (timestamp / log
/ polling detectors); this walk covers the other half of real
warehouses — no change stream exists, only yesterday's and today's
snapshots. ``snapshot_diff`` synthesizes the insert/update/delete
changelog (one full-outer key join + one xxhash64 projection), and the
existing CDC machinery consumes it unchanged.

The roll-forward is self-checking: applying the synthesized changelog
to the OLD snapshot must reproduce the NEW snapshot exactly — if the
diff missed or fabricated a change, the reconciliation count is
nonzero. Every stage is a lazy plan; on key-bucketed snapshot tables
the diff join runs with zero shuffle (tests/test_snapshot_diff.py pins
the plan).

Run:  python examples/snapshot_cdc_example.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.snapshot_diff import (
    diff_summary,
    snapshot_diff,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.transform import (
    apply_changelog,
    scd2_history,
)
from data_pipeline_for_real_time_retail_analytics_spark.session import get_spark
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("snapshot-cdc-example")

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # Yesterday vs today: some orders not yet placed (%5 -> inserts),
    # some purged (%3 -> deletes), some repriced (%11 -> updates).
    old_snap = base.where(F.col("o_orderkey") % 5 != 0)
    new_snap = base.where(F.col("o_orderkey") % 3 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 11 == 0, F.round(F.col("o_totalprice") + 1, 2)
        ).otherwise(F.col("o_totalprice")),
    )

    changelog = snapshot_diff(old_snap, new_snap, ["o_orderkey"])
    for row in diff_summary(changelog).orderBy("op").collect():
        print(f"{row['op']}: {row['n_rows']}")

    # Roll yesterday forward through the changelog; reconcile against
    # today. apply_changelog needs an ordering column — a snapshot diff
    # is one logical instant, so a constant timestamp is correct.
    stamped = changelog.withColumn("ts", F.lit("2026-01-01").cast("timestamp"))
    rolled = apply_changelog(
        old_snap, stamped, keys=["o_orderkey"], ts_col="ts", op_col="op"
    )
    mismatches = (
        rolled.unionByName(new_snap).groupBy(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        .count()
        .where(F.col("count") != 2)
        .count()
    )
    print(f"roll-forward mismatches: {mismatches}")
    assert mismatches == 0, "diff+apply failed to reproduce today's snapshot"

    # SCD-2 over the changed keys: yesterday's value opens each history,
    # today's update closes it.
    updates = changelog.where(F.col("op") == "update")
    versions = (
        old_snap.join(updates.select("o_orderkey"), "o_orderkey", "leftsemi")
        .withColumn("ts", F.lit("2025-12-31").cast("timestamp"))
        .unionByName(stamped.where(F.col("op") == "update").drop("op"))
    )
    history = scd2_history(
        versions,
        keys=["o_orderkey"],
        ts_col="ts",
        value_cols=["o_orderstatus", "o_totalprice"],
    )
    n_open = history.where(F.col("is_current")).count()
    print(f"scd2 rows: {history.count()} ({n_open} current)")


if __name__ == "__main__":
    main()

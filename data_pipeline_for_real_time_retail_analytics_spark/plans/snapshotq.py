"""Snapshot-diff showcase queries (registry-ready for round 7).

Wraps operators/snapshot_diff.py in the shape a daily batch-CDC job
takes: two dated snapshots of the same table, one full-outer diff,
one changelog summary. The two snapshots are carved deterministically
from the orders table so the diff has all three op classes and an
exact DuckDB oracle:

* OLD  = orders minus every ``o_orderkey % 10 == 3`` row
  (those rows are "new today" → inserts);
* NEW  = orders minus every ``o_orderkey % 13 == 5`` row
  (those rows "disappeared today" → deletes), with
  ``o_orderpriority`` rewritten to '9-RECHECK' on every
  ``o_orderkey % 7 == 0`` row (→ updates).

Rows hit by both exclusions appear in neither snapshot and must not
appear in the diff; rows hit by the update rule but absent from one
side classify as insert/delete, not update — the oracle reproduces
exactly the operator's precedence (insert, then delete, then changed
payload hash).

NOT registered in ``__spark_entry__`` this round: the r6 front window
is exactly consumed (20 never-green + 30 guard-mandated) and new
entries are never-green by definition. tests/test_snapshotq.py runs
the driver-identical parity comparison locally; flip the registry
entries in r7 (NOTES.md handoff item).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggmaint import (
    aggregate_snapshot,
    apply_changelog_to_agg,
    changelog_with_preimage,
)
from ..operators.snapshot_diff import diff_summary, snapshot_diff
from ..sources import load_table

#: modulus carve-outs for the synthetic old/new snapshots
INSERT_MOD, INSERT_REM = 10, 3
DELETE_MOD, DELETE_REM = 13, 5
UPDATE_MOD = 7
UPDATED_PRIORITY = "9-RECHECK"
#: the agg-maintenance variant also bumps the updated rows' price by
#: this (exact DECIMAL addition — identical in both engines)
PRICE_BUMP = 10


def _snapshots(
    spark: SparkSession, sf_dir: str, with_price: bool = False
) -> tuple[DataFrame, DataFrame]:
    cols = ["o_orderkey", "o_orderpriority"]
    orders = load_table(spark, sf_dir, "orders")
    if with_price:
        # DECIMAL at ingest: aggregate maintenance requires exactly
        # associative sums (operators/aggmaint.py docstring)
        orders = orders.withColumn(
            "o_totalprice", F.col("o_totalprice").cast("decimal(12,2)")
        )
        cols = cols + ["o_totalprice"]
    orders = orders.select(*cols)
    old = orders.where(F.col("o_orderkey") % INSERT_MOD != INSERT_REM)
    new = orders.where(F.col("o_orderkey") % DELETE_MOD != DELETE_REM).withColumn(
        "o_orderpriority",
        F.when(
            F.col("o_orderkey") % UPDATE_MOD == 0, F.lit(UPDATED_PRIORITY)
        ).otherwise(F.col("o_orderpriority")),
    )
    if with_price:
        new = new.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % UPDATE_MOD == 0,
                F.col("o_totalprice") + F.lit(PRICE_BUMP),
            ).otherwise(F.col("o_totalprice")),
        )
    return old, new


def q_orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full changelog between the two dated order snapshots
    (operators/snapshot_diff.py:snapshot_diff)."""
    old, new = _snapshots(spark, sf_dir)
    return snapshot_diff(old, new, ["o_orderkey"], ["o_orderpriority"]).orderBy(
        "o_orderkey"
    )


def q_orders_snapshot_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(op, n_rows) rollup of the same changelog — the pre-apply health
    check (operators/snapshot_diff.py:diff_summary)."""
    old, new = _snapshots(spark, sf_dir)
    return diff_summary(
        snapshot_diff(old, new, ["o_orderkey"], ["o_orderpriority"])
    ).orderBy("op")


def q_orders_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order count + total price for the NEW snapshot,
    produced by rolling the OLD snapshot's aggregate forward from the
    changelog — never re-aggregating the new snapshot
    (operators/aggmaint.py). The update rule rewrites the GROUP key
    (priority → '9-RECHECK'), so the maintenance path must move rows
    across groups, including into a group that did not exist."""
    old, new = _snapshots(spark, sf_dir, with_price=True)
    old_agg = aggregate_snapshot(
        old, ["o_orderpriority"], {"total_price": "o_totalprice"},
        count_col="n_orders",
    )
    changelog = changelog_with_preimage(
        old, new, ["o_orderkey"], ["o_orderpriority", "o_totalprice"]
    )
    rolled = apply_changelog_to_agg(
        old_agg, changelog, ["o_orderpriority"],
        {"total_price": "o_totalprice"}, count_col="n_orders",
    )
    return rolled.select(
        "o_orderpriority",
        "n_orders",
        F.round(F.col("total_price"), 2).cast("double").alias("total_price"),
    ).orderBy("o_orderpriority")


_DIFF_SQL = rf"""
    WITH old AS (
        SELECT o_orderkey, o_orderpriority FROM orders
        WHERE o_orderkey % {INSERT_MOD} <> {INSERT_REM}
    ),
    new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % {UPDATE_MOD} = 0
                    THEN '{UPDATED_PRIORITY}'
                    ELSE o_orderpriority END AS o_orderpriority
        FROM orders
        WHERE o_orderkey % {DELETE_MOD} <> {DELETE_REM}
    ),
    d AS (
        SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    WHEN n.o_orderpriority <> o.o_orderpriority THEN 'update'
               END AS op,
               CASE WHEN n.o_orderkey IS NULL THEN o.o_orderpriority
                    ELSE n.o_orderpriority END AS o_orderpriority
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT o_orderkey, op, o_orderpriority FROM d WHERE op IS NOT NULL
"""

ORACLES: dict[str, str] = {
    "orders_snapshot_diff": _DIFF_SQL + " ORDER BY o_orderkey",
    "orders_snapshot_summary": rf"""
        SELECT op, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM ({_DIFF_SQL}) GROUP BY op ORDER BY op
    """,
    # the maintained aggregate must equal a full re-aggregation of the
    # new snapshot — the oracle IS that recompute
    "orders_agg_maintenance": rf"""
        WITH new AS (
            SELECT CASE WHEN o_orderkey % {UPDATE_MOD} = 0
                        THEN '{UPDATED_PRIORITY}'
                        ELSE o_orderpriority END AS o_orderpriority,
                   CASE WHEN o_orderkey % {UPDATE_MOD} = 0
                        THEN CAST(o_totalprice AS DECIMAL(12,2))
                             + {PRICE_BUMP}
                        ELSE CAST(o_totalprice AS DECIMAL(12,2))
                   END AS o_totalprice
            FROM orders
            WHERE o_orderkey % {DELETE_MOD} <> {DELETE_REM}
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) AS total_price
        FROM new GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
}

QUERIES = {
    "orders_snapshot_diff": q_orders_snapshot_diff,
    "orders_snapshot_summary": q_orders_snapshot_summary,
    "orders_agg_maintenance": q_orders_agg_maintenance,
}

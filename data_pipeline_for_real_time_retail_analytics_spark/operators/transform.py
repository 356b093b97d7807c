"""Transformation layer: staging → dimension → fact models + incremental
merge (SURVEY.md §2.7, J2-J3).

The reference *declares* this layer in dbt config but never implements it
(reference: config/pipelines/sample_pipeline.yaml:55-99 declares
staging_customers / staging_orders / dim_customers / fact_orders with
``materialization: incremental, incremental_strategy: merge``; dbt/ holds
only .gitkeep). We implement the declared semantics Spark-first:

* staging = type normalization + renames (narrow, no shuffle);
* dims = broadcast join chains;
* facts = fact-fact shuffle join on the key, dims broadcast;
* incremental merge = anti-join + union rewrite (pure Spark, no Delta
  dependency), idempotent under reruns: re-merging the same batch yields
  the same table. On a Delta/Iceberg-equipped cluster swap in MERGE INTO —
  the call signature stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.agg import exact_sum, money, ratio
from ..sources import load_table

# ---------------------------------------------------------------------------
# staging models (declared: sample_pipeline.yaml:56-75)
# ---------------------------------------------------------------------------


def staging_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize the raw customer table: surrogate-friendly names, typed
    columns. Narrow transform — Catalyst keeps it in the scan stage."""
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_nationkey").cast("long").alias("nation_id"),
        F.round(F.col("c_acctbal"), 2).alias("account_balance"),
        F.col("c_mktsegment").alias("market_segment"),
    )


def staging_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize raw orders; negative-price rows are filtered as invalid
    (the declared `total_amount >= 0` contract, sample_pipeline.yaml:123)."""
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") >= 0)
        .select(
            F.col("o_orderkey").cast("long").alias("order_id"),
            F.col("o_custkey").cast("long").alias("customer_id"),
            F.col("o_orderstatus").alias("order_status"),
            F.round(F.col("o_totalprice"), 2).alias("total_amount"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
    )


# ---------------------------------------------------------------------------
# marts (declared: sample_pipeline.yaml:76-99)
# ---------------------------------------------------------------------------


def dim_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_customers: staging_customers enriched with nation/region via
    broadcast joins (dimensions are tiny relative to facts)."""
    cust = staging_customers(spark, sf_dir)
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nation_id"),
        F.col("n_name").alias("nation"),
        F.col("n_regionkey").alias("region_id"),
    )
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("region_id"),
        F.col("r_name").alias("region"),
    )
    return (
        cust.join(F.broadcast(nation), "nation_id")
        .join(F.broadcast(region), "region_id")
        .select(
            "customer_id", "customer_name", "market_segment",
            "account_balance", "nation", "region",
        )
    )


def fact_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact_orders: one row per order with customer attributes and
    lineitem-derived revenue. lineitem→orders is the only big shuffle
    (hash on orderkey); the customer-derived dim is unhinted — AQE
    broadcasts while it fits, shuffle-joins at scale."""
    orders = staging_orders(spark, sf_dir)
    dim = dim_customers(spark, sf_dir).select(
        "customer_id", "market_segment", "nation", "region"
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = money(F.col("l_extendedprice")) * (F.lit(1) - ratio(F.col("l_discount")))
    li_rev = li.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        exact_sum(revenue).alias("net_revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )
    return (
        orders.join(li_rev, "order_id", "left")
        .join(dim, "customer_id", "left")
        .select(
            "order_id", "customer_id", "order_status", "total_amount",
            "order_date", "order_priority", "net_revenue", "n_lineitems",
            "market_segment", "nation", "region",
        )
    )


# ---------------------------------------------------------------------------
# incremental merge (J3) — the declared-but-unimplemented hard part
# ---------------------------------------------------------------------------


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    dedupe_updates_on: str | None = None,
) -> DataFrame:
    """Upsert ``updates`` into ``target`` on ``keys`` — the declared
    ``incremental_strategy: merge, unique_key: order_id`` semantics
    (reference: sample_pipeline.yaml:93-94; requirements.md:52 demands
    correct upsert + dedup behavior).

    Pure-Spark rewrite (no Delta required):
        kept   = target ANTI-JOIN updates ON keys   (rows not superseded)
        result = kept UNION updates

    Both sides shuffle on the same key hash, so AQE co-partitions them;
    at 100 TB the target should be bucketed/partitioned by the key so the
    anti-join is shuffle-free on the target side. Idempotent: merging the
    same batch twice is a no-op.

    ``dedupe_updates_on``: if the update batch can carry several versions
    of one key, keep only the latest by this timestamp column (required
    for deterministic upserts)."""
    if dedupe_updates_on is not None:
        latest = [
            F.max_by(F.col(c), F.col(dedupe_updates_on)).alias(c)
            for c in updates.columns
            if c not in keys
        ]
        updates = updates.groupBy(*keys).agg(*latest).select(*updates.columns)
    kept = target.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
    return kept.unionByName(updates)


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    op_col: str,
    tiebreak_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """SCD Type-1 changelog apply: fold a CDC stream (insert/update/
    delete ops) into the current-state table. Last writer per key wins
    (ordered by ``ts_col`` then ``tiebreak_col``); a final ``delete``
    removes the key even if it exists in ``base``.

    This is the materialization the reference's log-based CDC feeds but
    never implements (reference: changelog probe data_sources.py:166-209;
    merge declared in sample_pipeline.yaml:93-94). Shape: one window
    shuffle on the key over the (small) change set, one anti-join + union
    against the base — the base table is never rewritten wholesale.
    Value columns are every non-key/ts/op column shared with ``base``.
    """
    value_cols = [c for c in base.columns if c not in keys]
    order = [F.desc(ts_col)] + (
        [F.desc(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = base.join(latest.select(*keys), keys, "left_anti")
    upserted = latest.where(F.col(op_col) != delete_op).select(*keys, *value_cols)
    return untouched.unionByName(upserted)


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
    tiebreak_col: str | None = None,
    end_of_time: str = "2200-01-01 00:00:00",
) -> DataFrame:
    """SCD Type-2 dimension history from a change stream: one row per
    version with [valid_from, valid_to) and an is_current flag —
    the slowly-changing-dimension layer the reference's dbt models
    declare (reference: design.md:205-211 staging→dim models).

    One window shuffle on the key; `lead` closes each version with the
    next version's start."""
    extra = [tiebreak_col] if tiebreak_col and tiebreak_col not in value_cols else []
    order = [F.asc("valid_from")] + ([F.asc(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.select(*keys, F.col(ts_col).alias("valid_from"), *value_cols, *extra)
        .withColumn("__next", F.lead(F.col("valid_from")).over(w))
        .withColumn("is_current", F.col("__next").isNull())
        .withColumn(
            "valid_to",
            F.coalesce(F.col("__next"), F.lit(end_of_time).cast("timestamp")),
        )
        .select(*keys, "valid_from", "valid_to", "is_current", *value_cols)
    )

"""Headline analytical queries over the retail star schema.

The reference's analytics layer (dbt staging → marts feeding Snowflake
dashboards) is declared but stubbed (reference: dbt/ contains only
.gitkeep; config/pipelines/sample_pipeline.yaml:55-99 declares the
models). These queries implement the declared intent Spark-first:
broadcast joins for dimensions, partial aggregation before shuffle,
filters that push into the parquet scan.

Money sums use exact DECIMAL aggregation (functions/agg.py) so results
are independent of reduction order — identical under AQE re-planning and
bit-equal to the DuckDB oracle. Every computed column is aliased to the
oracle's name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.agg import exact_avg, exact_sum, money, ratio
from ..sources import load_table


def pricing_summary(spark: SparkSession, sf_dir: str, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-style pricing summary: one scan of lineitem, map-side
    partial aggs, tiny shuffle on (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = money(F.col("l_quantity"))
    price = money(F.col("l_extendedprice"))
    disc = ratio(F.col("l_discount"))
    tax = ratio(F.col("l_tax"))
    disc_price = price * (F.lit(1) - disc)
    charge = disc_price * (F.lit(1) + tax)
    return (
        li.where(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(qty).alias("sum_qty"),
            exact_sum(price).alias("sum_base_price"),
            exact_sum(disc_price).alias("sum_disc_price"),
            exact_sum(charge).alias("sum_charge"),
            exact_avg(qty, 2).alias("avg_qty"),
            exact_avg(price, 2).alias("avg_price"),
            exact_avg(disc, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_segment(spark: SparkSession, sf_dir: str, since: str = "1996-01-01") -> DataFrame:
    """Flagship: revenue per market segment for orders after a watermark
    date. lineitem ⋈ orders (shuffle on orderkey) ⋈ broadcast(customer);
    the date filter pushes into the orders scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    revenue = money(F.col("l_extendedprice")) * (F.lit(1) - ratio(F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            exact_sum(revenue).alias("revenue"),
            F.count_distinct("o_orderkey").alias("n_orders"),
            F.count_distinct("c_custkey").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


def top_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-K customers by lifetime order value. Aggregate FIRST (shuffle on
    custkey), then broadcast-join the small aggregate to customer names —
    never sort the raw fact table."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    by_cust = orders.groupBy("o_custkey").agg(
        exact_sum(money(F.col("o_totalprice"))).alias("total_spent"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        by_cust.join(F.broadcast(cust), by_cust.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "total_spent", "n_orders")
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(k)
    )


def order_priority_counts(
    spark: SparkSession, sf_dir: str, lo: str = "1996-01-01", hi: str = "1997-01-01"
) -> DataFrame:
    """TPC-H Q4-flavored: orders in a date range that have at least one
    lineitem — existence via left-semi join (no row multiplication)."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation/region: the full dimension chain
    region ⋈ nation ⋈ customer ⋈ orders with every dimension broadcast."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            exact_sum(money(F.col("o_totalprice"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("r_name", "n_name")
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation over the events table — the
    batch twin of the streaming windowed agg (streaming/ingest.py); at
    100 TB this is a partial-agg + single shuffle on (hour, type)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(money(F.col("value"))).alias("sum_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("hour_start", "event_type")
    )

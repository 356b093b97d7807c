"""Quality-assertion and integrity-check tests (SURVEY.md §2.5-2.6)."""

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.quality import (
    all_null_row_count,
    custom_sql_assertion,
    duplicate_key_counts,
    fk_orphans,
    freshness_assertion,
    infinite_value_counts,
    null_saturation,
    rowcount_assertion,
    whole_row_duplicates,
)
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table


def test_fk_integrity_holds_on_star_schema(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    assert fk_orphans(orders, "o_custkey", cust, "c_custkey").count() == 0


def test_fk_orphans_detected(spark):
    child = spark.createDataFrame([(1,), (2,), (99,)], "k long")
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    orphans = fk_orphans(child, "k", parent, "k")
    assert [r["k"] for r in orphans.collect()] == [99]


def test_duplicate_key_counts(spark):
    df = spark.createDataFrame([(1,), (2,), (2,), (2,)], "k long")
    out = duplicate_key_counts(df, "k").collect()
    assert len(out) == 1 and out[0]["k"] == 2 and out[0]["n"] == 3


def test_whole_row_duplicates(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "k long, v string")
    assert whole_row_duplicates(df).first()["duplicate_rows"] == 1


def test_all_null_rows(spark):
    df = spark.createDataFrame(
        [(None, None), (1, None), (None, "x")], "a int, b string"
    )
    assert all_null_row_count(df).first()["all_null_rows"] == 1


def test_infinite_values(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("inf"),), (float("-inf"),), (None,)], "x double"
    )
    assert infinite_value_counts(df).first()["inf__x"] == 2


def test_null_saturation(spark):
    df = spark.createDataFrame(
        [(1, None)] * 99 + [(1, "x")], "a int, b string"
    )
    assert null_saturation(df, threshold=0.95) == ["b"]


def test_rowcount_and_freshness(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert rowcount_assertion(ev, 10).passed
    assert not rowcount_assertion(ev, 10**9).passed
    max_ts = ev.agg(F.max("ts")).first()[0]
    fresh = freshness_assertion(ev, "ts", 2.0, as_of=max_ts)
    assert fresh.passed
    stale = freshness_assertion(ev, "ts", 0.0001, as_of="2030-01-01")
    assert not stale.passed


def test_custom_sql_assertion(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    res = custom_sql_assertion(
        spark, "SELECT COUNT(*) FROM orders_v WHERE o_totalprice < 0", expected=0
    )
    assert res.passed

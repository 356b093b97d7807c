"""Transform layer tests: staging/dim/fact models and incremental merge
(J2-J3 — the reference declares these but never implements them)."""

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.transform import (
    dim_customers,
    fact_orders,
    merge_upsert,
    staging_orders,
)
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table


def test_dim_customers_complete(spark, sf_dir):
    dim = dim_customers(spark, sf_dir)
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert dim.count() == n_cust  # every customer resolves nation+region
    assert dim.where(F.col("nation").isNull() | F.col("region").isNull()).count() == 0


def test_fact_orders_shape(spark, sf_dir):
    fact = fact_orders(spark, sf_dir)
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert fact.count() == n_orders
    assert fact.select("order_id").distinct().count() == n_orders


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, v string, x double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "id long, v string, x double"
    )
    merged = merge_upsert(target, updates, ["id"])
    rows = {r["id"]: (r["v"], r["x"]) for r in merged.collect()}
    assert rows == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    once = merge_upsert(target, updates, ["id"])
    twice = merge_upsert(once, updates, ["id"])
    assert sorted(twice.collect()) == sorted(once.collect())


def test_merge_upsert_dedupes_update_batch(spark):
    target = spark.createDataFrame([(1, "a", "2024-01-01")], "id long, v string, ts string")
    updates = spark.createDataFrame(
        [(1, "old", "2024-01-02"), (1, "new", "2024-01-03")],
        "id long, v string, ts string",
    )
    merged = merge_upsert(target, updates, ["id"], dedupe_updates_on="ts")
    rows = merged.collect()
    assert len(rows) == 1 and rows[0]["v"] == "new"


def test_staging_orders_contract(spark, sf_dir):
    stg = staging_orders(spark, sf_dir)
    assert stg.where(F.col("total_amount") < 0).count() == 0
    assert dict(stg.dtypes)["order_date"] == "date"


def test_apply_changelog_semantics(spark):
    import datetime as dt
    from data_pipeline_for_real_time_retail_analytics_spark.operators.transform import apply_changelog

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    t = lambda s: dt.datetime.fromisoformat(s)
    changes = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:00:00"), 1, "update", 11.0),
            (1, t("2024-01-01 11:00:00"), 2, "update", 12.0),  # last writer wins
            (2, t("2024-01-01 10:00:00"), 3, "delete", None),  # key removed
            (4, t("2024-01-01 10:00:00"), 4, "insert", 40.0),  # new key
        ],
        "k long, ts timestamp, seq long, op string, v double",
    )
    out = {r["k"]: r["v"] for r in apply_changelog(
        base, changes, ["k"], "ts", "op", tiebreak_col="seq"
    ).collect()}
    assert out == {1: 12.0, 3: 30.0, 4: 40.0}


def test_apply_changelog_delete_then_insert_same_key(spark):
    import datetime as dt
    from data_pipeline_for_real_time_retail_analytics_spark.operators.transform import apply_changelog

    t = lambda s: dt.datetime.fromisoformat(s)
    base = spark.createDataFrame([(1, 10.0)], "k long, v double")
    changes = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:00:00"), 1, "delete", None),
            (1, t("2024-01-01 11:00:00"), 2, "insert", 99.0),  # re-created
        ],
        "k long, ts timestamp, seq long, op string, v double",
    )
    out = apply_changelog(base, changes, ["k"], "ts", "op", tiebreak_col="seq").collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, 99.0)]


def test_scd2_history_versions(spark):
    import datetime as dt
    from data_pipeline_for_real_time_retail_analytics_spark.operators.transform import scd2_history

    t = lambda s: dt.datetime.fromisoformat(s)
    changes = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:00:00"), 1, 10.0),
            (1, t("2024-01-02 10:00:00"), 2, 20.0),
            (2, t("2024-01-01 10:00:00"), 3, 5.0),
        ],
        "k long, ts timestamp, seq long, v double",
    )
    rows = scd2_history(changes, ["k"], "ts", ["v"], tiebreak_col="seq").orderBy(
        "k", "valid_from"
    ).collect()
    assert [(r["k"], r["v"], r["is_current"]) for r in rows] == [
        (1, 10.0, False), (1, 20.0, True), (2, 5.0, True)
    ]
    assert rows[0]["valid_to"] == t("2024-01-02 10:00:00")  # closed by next version
    assert rows[1]["valid_to"] == t("2200-01-01 00:00:00")  # open-ended sentinel

"""Unit tests for the temporal/skew operators: as-of join semantics,
window aggregation shapes, salted aggregation/join equivalence."""

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.asof import asof_join_backward
from data_pipeline_for_real_time_retail_analytics_spark.operators.skew import (
    salted_agg,
    salted_broadcast_join,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),
            (2, "k1", _ts("2024-01-01 10:05:00")),
            (3, "k2", _ts("2024-01-01 10:00:00")),
            (4, "k3", _ts("2024-01-01 10:00:00")),
        ],
        "id long, k string, ts timestamp",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 09:59:00"), 100, "a"),
            ("k1", _ts("2024-01-01 10:05:00"), 200, "b"),
            ("k2", _ts("2024-01-01 11:00:00"), 300, "c"),
        ],
        "k string, ts timestamp, v long, tag string",
    )


def test_asof_backward_basic(spark):
    out = asof_join_backward(
        _left(spark), _right(spark), ["k"], "ts", ["v", "tag"]
    )
    got = {r["id"]: (r["v"], r["tag"]) for r in out.collect()}
    assert got[1] == (100, "a")  # 09:59 is latest <= 10:00
    assert got[2] == (200, "b")  # exact match at 10:05 counts
    assert got[3] == (None, None)  # k2's only right row is later
    assert got[4] == (None, None)  # no right rows for k3


def test_asof_backward_strict(spark):
    out = asof_join_backward(
        _left(spark), _right(spark), ["k"], "ts", ["v", "tag"],
        allow_exact_matches=False,
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got[2] == 100  # exact 10:05 excluded, falls back to 09:59


def test_asof_payload_travels_as_one_row(spark):
    """A NULL field in the matched right row must stay NULL — not be
    backfilled from an earlier row (struct payload, not per-column last)."""
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01 09:00:00"), 7, "early"),
            ("k1", _ts("2024-01-01 09:59:00"), None, "late"),
        ],
        "k string, ts timestamp, v long, tag string",
    )
    out = asof_join_backward(_left(spark), right, ["k"], "ts", ["v", "tag"])
    got = {r["id"]: (r["v"], r["tag"]) for r in out.collect()}
    assert got[1] == (None, "late")


def test_tumbling_vs_sliding_shapes(spark):
    ev = spark.createDataFrame(
        [(i, _ts("2024-01-01 10:00:00") + dt.timedelta(minutes=10 * i)) for i in range(6)],
        "id long, ts timestamp",
    )
    tumb = tumbling_window_agg(ev, "ts", "1 hour", [F.count("*").alias("n")])
    assert [r["n"] for r in tumb.orderBy("window_start").collect()] == [6]
    slid = sliding_window_agg(
        ev, "ts", "1 hour", "30 minutes", [F.count("*").alias("n")]
    )
    rows = slid.orderBy("window_start").collect()
    # 10:00..10:50 events -> windows starting 09:30, 10:00, 10:30
    assert [r["n"] for r in rows] == [3, 6, 3]


def test_session_window_gap(spark):
    ev = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 10:05:00")),  # same session
            (3, "u1", _ts("2024-01-01 10:20:00")),  # 15 min gap -> new
            (4, "u2", _ts("2024-01-01 10:00:00")),
        ],
        "id long, user string, ts timestamp",
    )
    out = session_window_agg(
        ev, "ts", "10 minutes", [F.count("*").alias("n")], keys=["user"]
    ).orderBy("user", "session_start")
    rows = out.collect()
    assert [(r["user"], r["n"]) for r in rows] == [("u1", 2), ("u1", 1), ("u2", 1)]
    assert rows[0]["session_end"] == _ts("2024-01-01 10:15:00")


def test_salted_agg_matches_direct(spark, sf_dir):
    from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: (r["n"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum(F.col("value").cast("decimal(12,2)")).alias("s"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["s"])
        for r in salted_agg(
            ev,
            keys=["event_type"],
            salt_from=["event_id"],
            partial_aggs={"pc": F.count("*"), "ps": F.sum(F.col("value").cast("decimal(12,2)"))},
            merge_aggs={"n": F.sum("pc"), "s": F.sum("ps")},
            buckets=8,
        ).collect()
    }
    assert direct == salted


def test_salted_broadcast_join_matches_plain(spark, sf_dir):
    from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment").count()
    )
    salted = (
        salted_broadcast_join(
            orders, cust, "o_custkey", "c_custkey", salt_from=["o_orderkey"], buckets=4
        )
        .groupBy("c_mktsegment").count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

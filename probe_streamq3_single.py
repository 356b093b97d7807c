#!/usr/bin/env python
"""Probe: can the streamq3 two-phase drive collapse into ONE
AvailableNow drive with the sentinels staged up front?

Hypothesis (guide §1 measure-first): watermarks advance at batch END,
and Structured Streaming runs a no-data micro-batch when an advanced
watermark can evict state (spark.sql.streaming.noDataMicroBatches.
enabled, default true) — including under Trigger.AvailableNow. If so,
staging the far-future sentinel rows TOGETHER with the real data means:
batch 1 processes everything (inner matches emit; watermark advances to
sentinel_ts - delay at batch end), then the no-data batch flushes every
unmatched click's NULL completion. One drive instead of two, two
staging writes instead of four.

Prints per-batch progress (numInputRows, watermark) and compares the
single-drive output against the two-phase result row-for-row.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_for_real_time_retail_analytics_spark.plans.streamq3 import (  # noqa: E402
    _CLICKS_SCHEMA,
    _PURCHASES_SCHEMA,
    _SENTINEL_CLICK_USER,
    _SENTINEL_PURCHASE_USER,
    _SENTINEL_TS,
    _click_purchase_frames,
    q_stream_click_purchases_outer,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.streamq import (  # noqa: E402
    STREAM_SHUFFLE_PARTITIONS,
)
from data_pipeline_for_real_time_retail_analytics_spark.streaming.ingest import (  # noqa: E402
    interval_join,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def single_drive(spark: SparkSession, sf_dir: str):
    clicks, purchases = _click_purchase_frames(spark, sf_dir)
    sent_ts = F.to_timestamp(F.lit(_SENTINEL_TS))
    sent_click = spark.range(1).select(
        F.lit(-1).cast("long").alias("click_id"),
        F.lit(_SENTINEL_CLICK_USER).cast("long").alias("user_id"),
        sent_ts.alias("click_ts"),
    )
    sent_purch = spark.range(1).select(
        F.lit(-1).cast("long").alias("purchase_id"),
        F.lit(_SENTINEL_PURCHASE_USER).cast("long").alias("user_id"),
        sent_ts.alias("purchase_ts"),
        F.lit(0.0).alias("purchase_value"),
    )
    ldir = tempfile.mkdtemp(prefix="probe_sq3_clicks_")
    rdir = tempfile.mkdtemp(prefix="probe_sq3_purch_")
    ckpt = tempfile.mkdtemp(prefix="probe_sq3_ckpt_")
    outdir = tempfile.mkdtemp(prefix="probe_sq3_out_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        clicks.unionByName(sent_click).write.mode("overwrite").parquet(ldir)
        purchases.unionByName(sent_purch).write.mode("overwrite").parquet(rdir)
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS)
        )
        ls = spark.readStream.schema(_CLICKS_SCHEMA).parquet(ldir)
        rs = spark.readStream.schema(_PURCHASES_SCHEMA).parquet(rdir)
        joined = interval_join(
            ls, rs, key_cols=["user_id"], left_ts="click_ts",
            right_ts="purchase_ts", lookback="1 hour", how="left_outer",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        for p in q.recentProgress:
            print(
                "batch", p["batchId"],
                "inputRows", p["numInputRows"],
                "watermark", p["eventTime"].get("watermark"),
                "stateRows",
                [s["numRowsTotal"] for s in p.get("stateOperators", [])],
            )
        q.stop()
        out = (
            spark.read.parquet(outdir)
            .where(F.col("user_id") >= 0)
            .select(
                "click_id", "user_id", "click_ts",
                "purchase_id", "purchase_ts", "purchase_value",
            )
            .orderBy("click_id", F.col("purchase_id").asc_nulls_first())
            .localCheckpoint()
        )
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        for d in (ldir, rdir, ckpt, outdir):
            shutil.rmtree(d, ignore_errors=True)


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("probe_streamq3_single")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    one = single_drive(spark, SF_DIR)
    two = q_stream_click_purchases_outer(spark, SF_DIR)
    n_one, n_two = one.count(), two.count()
    diff_a = one.exceptAll(two).count()
    diff_b = two.exceptAll(one).count()
    print(json.dumps({
        "rows_single": n_one, "rows_twophase": n_two,
        "single_minus_two": diff_a, "two_minus_single": diff_b,
        "equal": n_one == n_two and diff_a == 0 and diff_b == 0,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

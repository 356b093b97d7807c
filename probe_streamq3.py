#!/usr/bin/env python
"""Phase dissection of stream_click_purchases_outer (r13)."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F

from data_pipeline_for_real_time_retail_analytics_spark.plans.streamq3 import (
    _CLICKS_SCHEMA,
    _PURCHASES_SCHEMA,
    _SENTINEL_CLICK_USER,
    _SENTINEL_PURCHASE_USER,
    _SENTINEL_TS,
    _click_purchase_frames,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.streamq import (
    STREAM_SHUFFLE_PARTITIONS,
)
from data_pipeline_for_real_time_retail_analytics_spark.streaming.ingest import (
    interval_join,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("probe_streamq3")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# streaming warmup (bench does the same before timing)
src = tempfile.mkdtemp(prefix="warm_src_")
ck = tempfile.mkdtemp(prefix="warm_ck_")
spark.range(10).write.mode("overwrite").parquet(src)
q = (
    spark.readStream.schema("id long").parquet(src)
    .groupBy().count()
    .writeStream.format("noop").option("checkpointLocation", ck)
    .outputMode("complete").trigger(availableNow=True).start()
)
q.awaitTermination(); q.stop()
shutil.rmtree(src, ignore_errors=True); shutil.rmtree(ck, ignore_errors=True)

t = {}
clicks, purchases = _click_purchase_frames(spark, SF_DIR)
ldir = tempfile.mkdtemp(prefix="p3_clicks_")
rdir = tempfile.mkdtemp(prefix="p3_purch_")
ckpt = tempfile.mkdtemp(prefix="p3_ckpt_")
outdir = tempfile.mkdtemp(prefix="p3_out_")
prev = spark.conf.get("spark.sql.shuffle.partitions")
t0 = time.perf_counter()
clicks.write.mode("overwrite").parquet(ldir)
purchases.write.mode("overwrite").parquet(rdir)
t["stage_inputs"] = time.perf_counter() - t0
print("staged files:", len([f for f in os.listdir(ldir) if f.endswith(".parquet")]),
      len([f for f in os.listdir(rdir) if f.endswith(".parquet")]))
spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS))


def drive(tag):
    t0 = time.perf_counter()
    ls = spark.readStream.schema(_CLICKS_SCHEMA).parquet(ldir)
    rs = spark.readStream.schema(_PURCHASES_SCHEMA).parquet(rdir)
    joined = interval_join(
        ls, rs, key_cols=["user_id"], left_ts="click_ts",
        right_ts="purchase_ts", lookback="1 hour", how="left_outer",
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", outdir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    prog = q.recentProgress
    q.stop()
    t[tag] = time.perf_counter() - t0
    for p in prog:
        print(tag, "batch", p["batchId"], "rows", p["numInputRows"],
              "durationMs", p["durationMs"])


drive("drive1")
t0 = time.perf_counter()
sent_ts = F.to_timestamp(F.lit(_SENTINEL_TS))
spark.range(1).select(
    F.lit(-1).cast("long").alias("click_id"),
    F.lit(_SENTINEL_CLICK_USER).cast("long").alias("user_id"),
    sent_ts.alias("click_ts"),
).write.mode("append").parquet(ldir)
spark.range(1).select(
    F.lit(-1).cast("long").alias("purchase_id"),
    F.lit(_SENTINEL_PURCHASE_USER).cast("long").alias("user_id"),
    sent_ts.alias("purchase_ts"),
    F.lit(0.0).alias("purchase_value"),
).write.mode("append").parquet(rdir)
t["sentinels"] = time.perf_counter() - t0
drive("drive2")
t0 = time.perf_counter()
out = (
    spark.read.parquet(outdir)
    .where(F.col("user_id") >= 0)
    .select("click_id", "user_id", "click_ts", "purchase_id",
            "purchase_ts", "purchase_value")
    .orderBy("click_id", F.col("purchase_id").asc_nulls_first())
    .localCheckpoint()
)
t["read_sort_ckpt"] = time.perf_counter() - t0
spark.conf.set("spark.sql.shuffle.partitions", prev)
for d in (ldir, rdir, ckpt, outdir):
    shutil.rmtree(d, ignore_errors=True)
for k, v in t.items():
    print(f"{k:15s} {v:7.2f}s")
spark.stop()

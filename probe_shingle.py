#!/usr/bin/env python
"""Probe with_shingles cost hypotheses (r13)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.dedup import (
    plant_near_dups,
    word_shingles,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.textstats import (
    ws_tokens,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.corpusbase import (
    PLANT_EVERY_DOCS,
    ID_OFFSET,
    _docs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def t(label, df, n=3):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print(f"  {best:7.2f}s  {label}", flush=True)


def shingles_concatws(text, n=3):
    toks = ws_tokens(text)
    joined = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).groupBy().count().write.format("noop").mode("overwrite").save()

    planted = plant_near_dups(
        _docs(spark, SF_DIR), every=PLANT_EVERY_DOCS, id_offset=ID_OFFSET
    )
    t("tokens only", planted.select("doc_id", ws_tokens(F.col("text")).alias("tk")))
    proj = planted.select(
        F.col("doc_id"), word_shingles(F.col("text"), 3).alias("shingles")
    )
    t("shingles project only", proj)
    t(
        "project+filter size(shingles)>0  [current]",
        proj.where(F.size("shingles") > 0).withColumn(
            "n_shingles", F.size("shingles")
        ),
    )
    t(
        "project+filter size(toks)>=3  [cheap predicate]",
        planted.where(F.size(ws_tokens(F.col("text"))) >= 3)
        .select(F.col("doc_id"), word_shingles(F.col("text"), 3).alias("shingles"))
        .withColumn("n_shingles", F.size("shingles")),
    )
    proj2 = planted.select(
        F.col("doc_id"), shingles_concatws(F.col("text"), 3).alias("shingles")
    )
    t("concat_ws shingles project only", proj2)
    t(
        "concat_ws + cheap predicate",
        planted.where(F.size(ws_tokens(F.col("text"))) >= 3)
        .select(
            F.col("doc_id"), shingles_concatws(F.col("text"), 3).alias("shingles")
        )
        .withColumn("n_shingles", F.size("shingles")),
    )
    diff = proj.exceptAll(proj2).count()
    print(f"  slice vs concat_ws mismatch rows: {diff}", flush=True)
    # no-distinct variant to see array_distinct share
    toks = ws_tokens(F.col("text"))
    nodist = planted.select(
        F.col("doc_id"),
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.array_join(F.slice(toks, i, 3), " "),
        ).alias("sh"),
    )
    t("shingles without array_distinct/when", nodist)
    spark.stop()


if __name__ == "__main__":
    main()

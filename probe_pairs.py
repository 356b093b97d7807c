#!/usr/bin/env python
"""Phase probe for the MinHash pair pipeline (r13 optimization round).

Times, against the planted sf0.1 corpus with the noop sink:
  banded     — shingling + signatures + band explode only
  joinonly   — band self-join, ids projected (no arrays, no verify)
  vdedup     — verify-then-dedup (current shape)
  dverify    — dedup-then-verify (pre-r13 shape, rebuilt inline)
at both registry parameterizations (12/3 and 16/8).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.dedup import (
    _banded_signatures,
    _exact_jaccard_verify,
    _verify_then_dedup,
    plant_near_dups,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.corpusbase import (
    PLANT_EVERY_DOCS,
    ID_OFFSET,
    _docs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {time.perf_counter()-t0:7.2f}s  {label}", flush=True)


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
    # warmup
    spark.range(1000).groupBy().count().write.format("noop").mode("overwrite").save()

    planted = plant_near_dups(
        _docs(spark, SF_DIR), every=PLANT_EVERY_DOCS, id_offset=ID_OFFSET
    )

    for num_perm, bands in ((12, 3), (16, 8)):
        print(f"== num_perm={num_perm} bands={bands}", flush=True)
        banded = _banded_signatures(planted, num_perm, bands, 3, "text", "doc_id")
        t("banded", banded)
        a = banded.alias("a")
        b = banded.hint("merge").alias("b")
        cand = a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("a.n_shingles").alias("n_a"),
            F.col("b.shingles").alias("sh_b"),
            F.col("b.n_shingles").alias("n_b"),
        )
        t("joinonly", cand.select("doc_a", "doc_b"))
        t("vdedup", _verify_then_dedup(cand, 0.5))
        t(
            "dverify",
            _exact_jaccard_verify(
                cand.dropDuplicates(["doc_a", "doc_b"]), 0.5
            ),
        )
    spark.stop()


if __name__ == "__main__":
    main()

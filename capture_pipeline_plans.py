#!/usr/bin/env python
"""Capture explain("formatted") for INTERNAL pipeline frames that the
registered queries materialize eagerly (localCheckpoint) — the final
query plan is then just a checkpoint-scan stub, so the interesting
before/after shape lives here.

Usage: python capture_pipeline_plans.py <outdir> <suffix>
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def explain_str(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> int:
    outdir, suffix = sys.argv[1:3]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("capture_pipeline_plans")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_pipeline_for_real_time_retail_analytics_spark.operators.dedup import (
        minhash_lsh_pairs,
        plant_near_dups,
        with_shingles,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.corpusbase import (
        ID_OFFSET,
        PLANT_EVERY_DOCS,
        _docs,
    )

    frames = {}
    planted = plant_near_dups(
        _docs(spark, sf_dir), every=PLANT_EVERY_DOCS, id_offset=ID_OFFSET
    )
    # the shared MinHash-LSH pair pipeline (pre-localCheckpoint): band
    # join -> candidate pairs -> exact-jaccard verify -> pair dedup
    frames["minhash_pair_pipeline"] = minhash_lsh_pairs(
        planted, num_perm=12, bands=3, threshold=0.5
    )
    # the shingle projection + its row filter (the filter-through-
    # projection finding)
    frames["with_shingles"] = with_shingles(planted, n=3)

    for name, df in frames.items():
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(explain_str(spark, df))
        print(f"wrote {path}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Embedding-centroid-drift scale spot-check (round-10 staged pair).

``label_centroid_shift``'s 100 TB claim: the only corpus-sized work is
the one posexplode pass partial-aggregated on (label, dim) — state is
labels × dims integers (640 here) no matter how many vectors flow
through it, and everything downstream is constant-size. This harness
copies the sf0.1 embeddings table N× (vec_id offsets, labels kept, so
per-label mass grows N×) and times the query at 1× and N×; near-linear
wall growth with flat output size is the evidence.

Usage: python bench_embdrift_scale.py [--scale 90]
Writes one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
COPY_OFFSET = 10_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=90)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_embdrift_scale")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_pipeline_for_real_time_retail_analytics_spark.plans import embdriftq

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    scaled_dir = tempfile.mkdtemp(prefix="embdrift_scaled_")
    try:
        copies = spark.range(args.scale).select(F.col("id").alias("__c"))
        (
            base.crossJoin(copies)
            .select(
                (F.col("vec_id") + F.col("__c") * COPY_OFFSET).alias("vec_id"),
                "embedding",
                "label",
            )
            .write.mode("overwrite")
            .parquet(f"{scaled_dir}/embeddings.parquet")
        )

        def run(sf_dir: str) -> float:
            # warm-up, then timed
            embdriftq.q_label_centroid_shift(spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            t0 = time.perf_counter()
            embdriftq.q_label_centroid_shift(spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)

        base_s = run(SF_DIR)
        scaled_s = run(scaled_dir)
        print(
            json.dumps(
                {
                    "probe": "embdrift_scale",
                    "scale": args.scale,
                    "base_sec": base_s,
                    "scaled_sec": scaled_s,
                    "ratio": round(scaled_s / base_s, 2) if base_s else -1.0,
                }
            )
        )
    finally:
        shutil.rmtree(scaled_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

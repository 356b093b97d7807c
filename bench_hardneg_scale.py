#!/usr/bin/env python
"""Scale probe for hard-negative mining (plans/hardnegq.py) — empirical
backing for the plan-shape claim: with a CONSTANT anchor set, cost is
one broadcast of the anchors against the scaled corpus with
WindowGroupLimit bounding the rank shuffle, so wall time should track
corpus size ~linearly (it is a full exact scorer by design; the
production shortlist path is the IVF-PQ composition, probed in
bench_ivfpq_scale.py). Corpus growth model and constant-query
convention shared with bench_semdedup_scale.py.

Usage: python bench_hardneg_scale.py [--scales 1,10,90]
Writes one JSON line: {"probe": "hardneg_scale", "points": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

from bench_semdedup_scale import COPY_OFFSET, SF_DIR, scaled_embeddings  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def hard_negatives_for(corpus, anchors, id_offset):
    from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import cosine

    q = anchors.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = corpus.select(
        F.col("vec_id").alias("match_id"), F.col("embedding").alias("cv")
    )
    sims = c.join(
        F.broadcast(q),
        (F.col("match_id") != F.col("query_id"))
        & (F.col("match_id") != F.col("query_id") + F.lit(id_offset)),
    ).select(
        "query_id", "match_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("match_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", "match_id", F.round("sim", 6), "rank")
    )


def main() -> None:
    from data_pipeline_for_real_time_retail_analytics_spark.plans.llm import (
        ID_OFFSET,
        PLANT_EVERY_VECS,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,90")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_hardneg_scale")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    anchors = (
        load_table(spark, SF_DIR, "embeddings")
        .where(F.col("vec_id") % PLANT_EVERY_VECS == 0)
        .localCheckpoint()
    )
    n_anchors = anchors.count()
    points = []
    for scale in (int(s) for s in args.scales.split(",")):
        corpus = scaled_embeddings(spark, scale).localCheckpoint()
        n = corpus.count()  # materialize outside the timed region
        t0 = time.perf_counter()
        hard_negatives_for(corpus, anchors, ID_OFFSET).write.format(
            "noop"
        ).mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        points.append(
            {"scale": scale, "corpus_rows": n, "anchors": n_anchors,
             "wall_sec": wall}
        )
        print(json.dumps(points[-1]), file=sys.stderr)
    print(json.dumps({"probe": "hardneg_scale", "points": points}))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scale probe for the composed IVF-PQ index (plans/ivfpqq.py) —
empirical backing for the composition's plan-shape claim: with a
CONSTANT query set, per-query cost tracks probed-cell OCCUPANCY
(≈ n_probe/n_cells of the corpus), and the scoring join moves codes
only. Corpus growth model and constant-query convention shared with
bench_pq_scale.py / bench_semdedup_scale.py.

Usage: python bench_ivfpq_scale.py [--scales 1,10,90]
Writes one JSON line: {"probe": "ivfpq_scale", "points": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, Window, functions as F  # noqa: E402

from bench_semdedup_scale import scaled_embeddings  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
QUERY_EVERY = 100
BASE_MAX_ID = 100_000


def ivfpq_topk_for(embs, queries):
    from data_pipeline_for_real_time_retail_analytics_spark.operators.pq import (
        _qdist,
        pq_assignments,
        pq_codebooks,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
        _assign_cells,
        ivf_centroids,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.ivfpqq import (
        N_CELLS,
        N_PROBE,
        TOPK,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.pqq import (
        PQ_K,
        PQ_M,
    )

    cb = pq_codebooks(embs, m=PQ_M, k=PQ_K).localCheckpoint()
    cents = ivf_centroids(embs, N_CELLS).localCheckpoint()
    corpus_cells = _assign_cells(
        embs, cents, "match_id", "cv2", 1, "vec_id", "embedding"
    ).select("match_id", "cell")
    query_cells = _assign_cells(
        queries, cents, "query_id", "qv", N_PROBE, "vec_id", "embedding"
    ).select("query_id", "cell")
    candidates = (
        corpus_cells.join(query_cells, "cell")
        .where(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id")
        .dropDuplicates(["query_id", "match_id"])
    )
    assigned = pq_assignments(embs, cb)
    sub_dim = F.size("scv")
    lut = queries.join(F.broadcast(cb), how="cross").select(
        F.col("vec_id").alias("query_id"),
        "sub",
        "code",
        _qdist(
            F.slice(
                F.col("embedding"),
                (F.col("sub") * sub_dim + 1).cast("int"),
                sub_dim.cast("int"),
            ),
            F.col("scv"),
        ).alias("qd"),
    )
    scored = (
        candidates.join(assigned, candidates.match_id == assigned.vec_id)
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "match_id")
        .agg(F.sum("qd").alias("adc_dist_q12"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist_q12", "match_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= TOPK)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,90")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_ivfpq_scale")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        )
        .config("spark.cleaner.periodicGC.interval", "45s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    points = []
    for s in scales:
        embs = scaled_embeddings(spark, s).localCheckpoint()
        n = embs.count()
        queries = embs.where(
            (F.col("vec_id") % QUERY_EVERY == 0)
            & (F.col("vec_id") < BASE_MAX_ID)
        ).localCheckpoint()
        t0 = time.perf_counter()
        ivfpq_topk_for(embs, queries).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.perf_counter() - t0, 3)
        points.append({"scale": s, "corpus_rows": n, "ivfpq_sec": wall})
    print(json.dumps({"probe": "ivfpq_scale", "points": points}))


if __name__ == "__main__":
    main()

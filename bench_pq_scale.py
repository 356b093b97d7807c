#!/usr/bin/env python
"""Scale probe for product quantization (operators/pq.py) — empirical
backing for its two plan-shape claims:

1. encoding is linear in corpus size: the codebook is FIXED (m·k
   sub-centroids — PQ compresses vectors, it does not grow its
   codebook with n), so encode cost is n · m·k·sub_dim map-side work
   plus one partial-aggregated shuffle of n·m rows;
2. ADC scoring is linear in corpus size per query: a broadcast lookup
   table join on (block, code) + one partial-aggregated sum — with a
   CONSTANT query set, scaled/base wall should track n.

Scaled corpus: the sign-flip copy generator from
bench_semdedup_scale.py (near-orthogonal copies, id-offset) — reused
verbatim so embedding probes share one corpus-growth model.

Usage: python bench_pq_scale.py [--scales 1,10,30,90]
Writes one JSON line: {"probe": "pq_scale", "points": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from bench_semdedup_scale import scaled_embeddings  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: constant query set across scales: base-copy vectors only (copies are
#: id-offset by ≥100k), every 100th — isolates corpus growth from query
#: growth
QUERY_EVERY = 100
BASE_MAX_ID = 100_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,30")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_pq_scale")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_pipeline_for_real_time_retail_analytics_spark.operators.pq import (
        pq_adc_topk,
        pq_codebooks,
        pq_codes,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.operators.sq import (
        sq8_codes,
        sq8_scales,
        sq8_topk,
    )

    points = []
    for s in scales:
        embs = scaled_embeddings(spark, s).localCheckpoint()
        n = embs.count()
        cb = pq_codebooks(embs, m=8, k=16).localCheckpoint()
        queries = embs.where(
            (F.col("vec_id") % QUERY_EVERY == 0)
            & (F.col("vec_id") < BASE_MAX_ID)
        ).localCheckpoint()
        n_q = queries.count()

        t0 = time.perf_counter()
        pq_codes(embs, cb).write.format("noop").mode(
            "overwrite"
        ).save()
        encode_s = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        pq_adc_topk(queries, embs, cb, k=5).write.format("noop").mode(
            "overwrite"
        ).save()
        topk_s = round(time.perf_counter() - t0, 3)

        # the 4x near-exact tier on the same corpus-growth model
        scales_df = sq8_scales(embs).localCheckpoint()
        t0 = time.perf_counter()
        sq8_codes(embs, scales_df).write.format("noop").mode(
            "overwrite"
        ).save()
        sq_encode_s = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        sq8_topk(queries, embs, scales_df, k=5).write.format("noop").mode(
            "overwrite"
        ).save()
        sq_topk_s = round(time.perf_counter() - t0, 3)

        points.append(
            {
                "scale": s,
                "n_vectors": n,
                "n_queries": n_q,
                "encode_sec": encode_s,
                "adc_topk_sec": topk_s,
                "sq8_encode_sec": sq_encode_s,
                "sq8_topk_sec": sq_topk_s,
            }
        )
        print(json.dumps(points[-1]), file=sys.stderr)

    print(json.dumps({"probe": "pq_scale", "points": points}))
    spark.stop()


if __name__ == "__main__":
    main()

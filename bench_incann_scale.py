#!/usr/bin/env python
"""Incremental-ANN scale spot-check (round-11 staged pair).

``incremental_ann_new_vecs``'s 100 TB claim: a daily ingest batch
probed against the standing sign-LSH index costs (per batch vector)
the occupancy of its bucket — n_corpus / 2^n_bits candidates — so a
CONSTANT batch against a growing corpus grows linearly, and a
production deployment keeps per-bucket occupancy flat by growing
n_bits with the corpus (log2(n / target_occupancy)), exactly like the
text twin's band parameterization (bench_incremental_index.py).

This probe measures the deployment shape: the ingest batch is pinned
to the BASE corpus's planted/novel derivation (constant 41 vectors at
sf0.1 — 20 copies + 21 reversed, matching the emitted n_batch field)
while the standing corpus scales N× (vec_id offsets below
the batch's 10M/20M id bands, so no collision with the batch ids).
Near-linear wall growth at N× corpus with a fixed batch is the
evidence; the registered query itself derives its batch from the
corpus it reads, which is the correctness-gate shape, not the
deployment shape.

Usage: python bench_incann_scale.py [--scale 90]
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
#: per-copy vec_id offset; scale 90 tops out at ~9.1M < the batch's
#: 10M/20M id bands, so scaled corpus ids never collide with batch ids
COPY_OFFSET = 100_000
MAX_SCALE = 90


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=90)
    args = ap.parse_args()
    if not 2 <= args.scale <= MAX_SCALE:
        ap.error(f"--scale must be in [2, {MAX_SCALE}]")

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_incann_scale")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
        ann_topk_sign_lsh,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.incannq import (
        K,
        _ingest_batch,
    )

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    batch = _ingest_batch(base).localCheckpoint()
    n_batch = batch.count()

    scaled_dir = tempfile.mkdtemp(prefix="incann_scaled_")
    try:
        copies = spark.range(args.scale).select(F.col("id").alias("__c"))
        (
            base.crossJoin(copies)
            .select(
                (F.col("vec_id") + F.col("__c") * COPY_OFFSET).alias("vec_id"),
                "embedding",
            )
            .write.mode("overwrite")
            .parquet(f"{scaled_dir}/embeddings.parquet")
        )

        def run(path: str) -> float:
            corpus = spark.read.parquet(path).select("vec_id", "embedding")
            # warm-up, then timed
            for timed in (False, True):
                t0 = time.perf_counter()
                ann_topk_sign_lsh(batch, corpus, k=K, n_bits=8).write.format(
                    "noop"
                ).mode("overwrite").save()
                if timed:
                    return round(time.perf_counter() - t0, 3)
            raise AssertionError("unreachable")

        base_s = run(f"{SF_DIR}/embeddings.parquet")
        scaled_s = run(f"{scaled_dir}/embeddings.parquet")
        print(
            json.dumps(
                {
                    "metric": "incann_scale",
                    "scale": args.scale,
                    "n_batch": n_batch,
                    "base_sec": base_s,
                    "scaled_sec": scaled_s,
                    "ratio": round(scaled_s / base_s, 2) if base_s > 0 else -1.0,
                    "sf_dir": SF_DIR,
                }
            )
        )
    finally:
        shutil.rmtree(scaled_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

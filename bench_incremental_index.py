#!/usr/bin/env python
"""Amortized incremental-dedup measurement (round-6).

`minhash_lsh_pairs_between` documents the 100 TB amortization path:
"persist the corpus band table and this becomes an index lookup"
(operators/dedup.py). This script MEASURES that claim at 10x documents:

* ``recompute``  — the shipped shape: every daily batch re-derives the
  standing corpus's banded signatures before the band join.
* ``indexed``    — the amortized shape: the corpus band table is built
  ONCE and persisted as parquet (the "dedup index"); each batch derives
  only its own bands and equi-joins the stored index.

Reported: one-time index build cost + size, then per-batch wall for
both shapes (identical pair outputs, asserted). At a real 100 TB
corpus the recompute shape is impossible (it re-shingles the corpus
per batch); this quantifies the crossover already visible at local SF.

Run:  python bench_incremental_index.py [--scale 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("bench_incremental_index")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.cleaner.periodicGC.interval", "45s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench as _bench

    _bench._warmup(spark)

    from bench_scale import build_scaled_dir
    from data_pipeline_for_real_time_retail_analytics_spark.operators.dedup import (
        _banded_signatures,
        minhash_lsh_pairs_between,
        plant_near_dups,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.llm import (
        ID_OFFSET,
        PLANT_EVERY_DOCS,
        _docs,
    )

    scaled_dir = f"/tmp/spark_graft_mhshape_{args.scale}x"
    if not os.path.exists(f"{scaled_dir}/documents.parquet"):
        build_scaled_dir(spark, scaled_dir, args.scale)

    planted = plant_near_dups(
        _docs(spark, scaled_dir), every=PLANT_EVERY_DOCS, id_offset=ID_OFFSET
    )
    batch = planted.where(F.col("doc_id") >= ID_OFFSET)
    corpus = planted.where(F.col("doc_id") < ID_OFFSET)

    # ---- shipped shape: corpus bands re-derived per batch ----
    t0 = time.perf_counter()
    n_recompute = minhash_lsh_pairs_between(batch, corpus).count()
    recompute_sec = round(time.perf_counter() - t0, 2)

    # ---- amortized shape: build the index once ----
    index_path = "/tmp/spark_graft_dedup_index"
    shutil.rmtree(index_path, ignore_errors=True)
    t0 = time.perf_counter()
    _banded_signatures(corpus, 12, 3, 3, "text", "doc_id").write.mode(
        "overwrite"
    ).parquet(index_path)
    index_build_sec = round(time.perf_counter() - t0, 2)
    index_mb = round(
        sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(index_path)
            for f in fs
        )
        / 1e6,
        1,
    )

    # per-batch cost against the stored index (same join + verify as
    # minhash_lsh_pairs_between, corpus side read from parquet)
    t0 = time.perf_counter()
    cb = spark.read.parquet(index_path).alias("c")
    nb = _banded_signatures(batch, 12, 3, 3, "text", "doc_id").alias("b")
    cand = (
        cb.join(
            nb,
            (F.col("c.band_id") == F.col("b.band_id"))
            & (F.col("c.band_key") == F.col("b.band_key")),
        )
        .select(
            F.col("c.doc_id").alias("corpus_id"),
            F.col("b.doc_id").alias("new_id"),
            F.col("c.shingles").alias("sh_a"),
            F.col("c.n_shingles").alias("n_a"),
            F.col("b.shingles").alias("sh_b"),
            F.col("b.n_shingles").alias("n_b"),
        )
        .dropDuplicates(["corpus_id", "new_id"])
    )
    n_common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = n_common / (F.col("n_a") + F.col("n_b") - n_common)
    n_indexed = (
        cand.select("corpus_id", "new_id", F.round(jac, 4).alias("jaccard"))
        .where(F.round(jac, 4) >= 0.5)
        .count()
    )
    indexed_sec = round(time.perf_counter() - t0, 2)

    assert n_recompute == n_indexed, (n_recompute, n_indexed)
    print(
        json.dumps(
            {
                "scale": args.scale,
                "pairs": n_indexed,
                "recompute_batch_sec": recompute_sec,
                "index_build_once_sec": index_build_sec,
                "index_mb": index_mb,
                "indexed_batch_sec": indexed_sec,
                "speedup_per_batch": round(recompute_sec / indexed_sec, 1)
                if indexed_sec
                else -1.0,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

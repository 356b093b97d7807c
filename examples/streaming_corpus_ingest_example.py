#!/usr/bin/env python
"""Streaming corpus ingest with per-batch dedup against the standing
corpus — the continuous form of the daily-ingest shape.

Ties two arcs together: Structured Streaming file arrival (documents
land as files; ``maxFilesPerTrigger=1`` + ``Trigger.AvailableNow``
drains them one micro-batch per file) and incremental near-dup
detection (``minhash_lsh_pairs_between``: the arriving batch meets
ONLY its band collisions against the corpus — never a corpus×batch
comparison, and at production scale the corpus band signatures persist
as an index, bench_incremental_index.py). Each micro-batch:

1. flag arrivals whose shingle Jaccard against the standing corpus
   clears the threshold;
2. drop them, append the survivors to the corpus (idempotent parquet
   append inside foreachBatch — the checkpoint replays a failed epoch);
3. log (arrived, dropped, appended).

The arrival slices carry planted exact copies of corpus documents, so
the expected outcome is checkable: every planted copy must be dropped,
every genuinely-new document must land.

Run:  python examples/streaming_corpus_ingest_example.py [sf_dir]
"""

from __future__ import annotations

import glob
import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.dedup import (
    minhash_lsh_pairs_between,
)
from data_pipeline_for_real_time_retail_analytics_spark.session import get_spark
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

#: arriving docs with ids >= this are planted copies of corpus docs
COPY_OFFSET = 50_000_000


def _stage_one_file(df, directory: str, name: str) -> None:
    """Write ``df`` as a single parquet file named ``name`` inside
    ``directory`` (a file-arrival stream watches one flat dir)."""
    tmp = tempfile.mkdtemp(prefix="ingest_slice_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, f"{directory}/{name}.parquet")
    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-corpus-ingest-example")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    work = tempfile.mkdtemp(prefix="corpus_ingest_")
    corpus_dir, arrivals_dir, ckpt = (
        f"{work}/corpus", f"{work}/arrivals", f"{work}/ckpt"
    )
    import os

    os.makedirs(arrivals_dir)

    # standing corpus = first 60% of docs; two arrival slices carry the
    # rest plus planted exact copies of corpus docs (must be dropped)
    n = docs.count()
    cut = int(n * 0.6)
    corpus0 = docs.where(F.col("doc_id") < cut)
    corpus0.write.parquet(corpus_dir)
    fresh = docs.where(F.col("doc_id") >= cut)
    half = (cut + n) // 2
    planted = corpus0.where(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + COPY_OFFSET
    )
    _stage_one_file(
        fresh.where(F.col("doc_id") < half).unionByName(
            planted.where(F.col("doc_id") % 20 == COPY_OFFSET % 20)
        ),
        arrivals_dir, "slice1",
    )
    _stage_one_file(
        fresh.where(F.col("doc_id") >= half).unionByName(
            planted.where(F.col("doc_id") % 20 != COPY_OFFSET % 20)
        ),
        arrivals_dir, "slice2",
    )

    log: list[tuple[int, int, int, int]] = []

    def ingest_batch(batch_df, epoch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()  # one computation per use below
        corpus = spark.read.parquet(corpus_dir)
        dupes = (
            minhash_lsh_pairs_between(batch_df, corpus)
            .select(F.col("new_id").alias("doc_id"))
            .distinct()
        )
        survivors = batch_df.join(dupes, "doc_id", "left_anti")
        survivors.write.mode("append").parquet(corpus_dir)
        arrived = batch_df.count()
        kept = survivors.count()
        log.append((epoch_id, arrived, arrived - kept, kept))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals_dir)
    )
    q = (
        stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    for epoch, arrived, dropped, kept in log:
        print(f"batch {epoch}: arrived={arrived} near-dups dropped={dropped} appended={kept}")

    final = spark.read.parquet(corpus_dir)
    survived_copies = final.where(F.col("doc_id") >= COPY_OFFSET).count()
    total = final.count()
    print(f"final corpus: {total} docs")
    # every planted exact copy must be dropped; fresh docs may ALSO be
    # dropped when they are organic near-dups of corpus boilerplate —
    # that's the operator working, so the accounting check is that the
    # final corpus equals seed + per-batch survivors exactly
    expected = cut + sum(kept for _e, _a, _d, kept in log)
    print(f"planted copies dropped: {survived_copies == 0}")
    print(f"corpus accounting exact: {total == expected}")

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

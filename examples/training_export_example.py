#!/usr/bin/env python
"""End-to-end training-data EXPORT walk: incremental dedup of an ingest
batch → LM-perplexity quality gate → sequence packing → deterministic
shard shuffle, on the synthetic documents table.

Picks up where corpus_pipeline_example.py stops (a curated corpus) and
produces what a trainer actually consumes: fixed-capacity packed
sequences addressed into reproducible export shards. Every stage is a
lazy DataFrame plan; the same composition runs unchanged on a
1000-executor cluster — the incremental dedup is a banded equi-join
against the standing corpus (never corpus×batch pairs), packing is a
distributed prefix-sum (no global single-partition window), and shard
addressing is per-row hashing plus per-shard windows.

Run:  python examples/training_export_example.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.dedup import (
    minhash_lsh_pairs_between,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.lm import (
    score_bigram_lm,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.packing import (
    pack_sequences,
    shuffle_shards,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.textstats import (
    ws_tokens,
)
from data_pipeline_for_real_time_retail_analytics_spark.session import get_spark
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-export-example")
    docs = load_table(spark, sf_dir, "documents")

    # Simulate a standing corpus + today's ingest batch (every 10th doc)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)

    # 1. incremental dedup: which new docs already live in the corpus?
    #    (banded MinHash join — the batch never pairs with the whole
    #    corpus, only with its band collisions)
    dup_hits = minhash_lsh_pairs_between(batch, corpus, threshold=0.5)
    fresh = batch.join(
        dup_hits.select(F.col("new_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )

    # 2. corpus-LM surprise gate: drop the most boilerplate-like tail
    #    (lowest bits/bigram) — they add tokens, not information.
    #    score_bigram_lm emits no row for docs with <2 tokens, so LEFT
    #    join the scores and keep unscored docs explicitly: only a
    #    measured low-surprise score rejects a doc, absence never does.
    scored = score_bigram_lm(corpus.unionByName(fresh))
    admitted = (
        fresh.join(scored.select("doc_id", "nll_bits"), "doc_id", "left")
        .where(F.col("nll_bits").isNull() | (F.col("nll_bits") > 1.0))
        .drop("nll_bits")
    )

    # 3. pack the admitted docs into fixed-capacity training sequences
    sized = admitted.select(
        "doc_id", F.size(ws_tokens(F.col("text"))).alias("n_tokens")
    )
    packed = pack_sequences(sized, "doc_id", "n_tokens", seq_len=128)

    # 4. address every doc into a reproducible export shard permutation
    shards = shuffle_shards(admitted.select("doc_id"), "doc_id", n_shards=8)

    print(f"ingest batch:     {batch.count()}")
    print(f"already in corpus:{dup_hits.select('new_id').distinct().count()}")
    print(f"admitted:         {admitted.count()}")
    n_seqs = packed.agg(F.count_distinct("seq_id")).collect()[0][0]
    print(f"packed sequences: {n_seqs}")
    shards.groupBy("shard").agg(F.count(F.lit(1)).alias("n_docs")).orderBy(
        "shard"
    ).show()


if __name__ == "__main__":
    main()

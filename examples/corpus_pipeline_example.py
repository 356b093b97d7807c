#!/usr/bin/env python
"""End-to-end LLM training-data corpus walk: clean → quality-filter →
near-dup dedup → chunk → deterministic split, on the synthetic
documents table.

Every stage is a lazy DataFrame plan (no collect until the final
``show``); the same composition runs unchanged on a 1000-executor
cluster — filters are zero-shuffle projections, dedup is a bounded
band equi-join plus pointer-jumping components, chunking is a
generator expansion, and the split is hash-range membership
(partition-count independent).

Run:  python examples/corpus_pipeline_example.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.dedup import (
    boilerplate_ngrams,
    dedup_clusters,
    dedup_keep_canonical,
    minhash_lsh_pairs,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.mixture import (
    target_mixture_sample,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.sampling import (
    train_val_test_split,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.textclean import (
    cleaned_documents,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.textstats import (
    chunk_documents,
    corpus_filter,
)
from data_pipeline_for_real_time_retail_analytics_spark.session import get_spark
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-example")

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. normalize + mask PII (control chars, emails/phones, whitespace);
    #    rename the cleaned text back so downstream stages compose
    clean = cleaned_documents(docs).select(
        "doc_id", F.col("text_clean").alias("text")
    )

    # 2. composite quality gate (C4/Gopher-style), keep-only
    gated = clean.join(
        corpus_filter(clean).where("keep").select("doc_id"), "doc_id"
    )

    # 3. near-duplicate removal: MinHash-LSH candidates → exact-Jaccard
    #    verify → connected components → keep one doc per cluster
    pairs = minhash_lsh_pairs(gated, threshold=0.5)
    survivors = dedup_keep_canonical(gated, dedup_clusters(pairs))

    # 4. boilerplate audit: spans repeating across surviving docs (df
    #    pass is partial-aggregated; posting lists bounded by the df cap)
    boiler = boilerplate_ngrams(survivors, n=5, min_docs=2)

    # 5. thin to the target language mixture (binding language kept
    #    whole, the rest downsampled by hash-bucket membership)
    with_lang = survivors.join(docs.select("doc_id", "lang"), "doc_id")
    mixed = target_mixture_sample(
        with_lang, "doc_id", "lang",
        targets={"en": 0.4, "es": 0.2, "fr": 0.2, "de": 0.1, "zh": 0.1},
    )

    # 6. overlapping token-window chunks (the model-input unit)
    chunks = chunk_documents(mixed, chunk_tokens=64, overlap=8)

    # 7. deterministic hash-range split — stable under re-runs,
    #    partitioning, and corpus growth
    split = train_val_test_split(mixed, "doc_id", val_rate=0.05,
                                 test_rate=0.05)

    print(f"raw docs:        {n_raw}")
    print(f"after filter:    {survivors.count()}")
    print(f"boilerplate 5-grams: {boiler.count()}")
    print(f"after mixture:   {mixed.count()}")
    print(f"chunks:          {chunks.count()}")
    split.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs")).orderBy(
        "split"
    ).show()
    chunks.orderBy("doc_id", "chunk_id").show(5, truncate=60)


if __name__ == "__main__":
    main()

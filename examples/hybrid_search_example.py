#!/usr/bin/env python
"""Hybrid-retrieval walk: BM25 lexical search → semantic expansion
from the best lexical hit → reciprocal-rank fusion.

The retrieval shape this demonstrates end to end:

1. score the corpus lexically against a keyword query
   (``bm25_scores`` — saturating tf, length-normalized, idf-weighted);
2. take the best lexical hit's EMBEDDING as the semantic query and
   pull its exact cosine top-k (``cosine_topk``) — "more like the
   best match", which surfaces documents sharing no query keyword;
3. fuse the two lists by rank (``rrf_fuse``) — RRF needs no score
   calibration, and documents found by BOTH retrievers rise.

At scale each leg is the bounded shape its operator documents (BM25's
shuffle is query-term hits; the ANN tier swaps in for brute-force
cosine), and the fusion is arithmetic over two top-k lists — driver
work is two single-row lookups.

Run:  python examples/hybrid_search_example.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.bm25 import (
    bm25_scores,
    rrf_fuse,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
    cosine_topk,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.searchq import (
    QUERY_TERMS,
    RRF_K,
)
from data_pipeline_for_real_time_retail_analytics_spark.session import get_spark
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

TOP_K = 25


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("hybrid-search-example")

    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # 1. lexical leg
    lex = bm25_scores(docs, QUERY_TERMS)
    best = lex.orderBy(F.col("bm25").desc(), F.col("doc_id")).first()
    if best is None:
        print(f"no document matches {QUERY_TERMS}; nothing to search")
        spark.stop()
        return
    print(f"query {QUERY_TERMS}: best lexical hit doc {best.doc_id} "
          f"(bm25 {best.bm25}, {best.matched_terms} terms)")

    # 2. semantic leg: expand from the best hit's embedding; carry
    # cosine_topk's own rank as the fusion order key
    qv = embs.where(F.col("vec_id") == best.doc_id)
    sem = cosine_topk(qv, embs, k=TOP_K).select(
        F.col("match_id").alias("doc_id"),
        (-F.col("rank")).alias("sem_order"),
    )

    # 3. fuse by rank
    fused = rrf_fuse([(lex, "bm25"), (sem, "sem_order")],
                     k=RRF_K, top_n=TOP_K)
    enriched = (
        fused.join(docs.select("doc_id", "source", "lang"), "doc_id")
        .orderBy(F.col("rrf").desc(), F.col("doc_id"))
    )
    enriched.show(10, truncate=False)

    by_lists = {r.n_lists: r.n for r in
                fused.groupBy("n_lists").agg(F.count("*").alias("n")).collect()}
    print(f"fused candidates: {sum(by_lists.values())} "
          f"(both retrievers: {by_lists.get(2, 0)}, "
          f"single retriever: {by_lists.get(1, 0)})")

    spark.stop()


if __name__ == "__main__":
    main()

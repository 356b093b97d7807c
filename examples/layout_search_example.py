#!/usr/bin/env python
"""Layout-aware retrieval walk: OPTIMIZE ZORDER the corpus, prune the
scan with the clustered predicates, then run hybrid (BM25 + cosine)
retrieval over the pruned slice.

Composes three of the engine's scale levers end to end:

1. enrich the corpus with query-time pruning columns — language id and
   quality score (pure column expressions, operators/textstats.py) —
   and dictionary-code them to integers (the z-order input contract);
2. rewrite the corpus with ``zorder_compact`` clustered along the
   Morton curve of (lang_code, quality_milli): after the rewrite, a
   predicate on EITHER dimension prunes parquet files by footer
   min/max, not just the leading sort key (operators/zorder.py);
3. retrieve over the pruned slice only: BM25 lexical scores fused with
   exact cosine top-k by reciprocal rank (operators/bm25.py).

At 100 TB the point of step 2 is that step 3's scan cost tracks the
SELECTED slice, not the corpus: the z-ordered layout turns the
(lang, quality) filter into file skipping before a single token is
tokenized.

Run:  python examples/layout_search_example.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.bm25 import (
    bm25_scores,
    rrf_fuse,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
    cosine_topk,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.textstats import (
    language_id,
    quality_score,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.zorder import (
    zorder_compact,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.searchq import (
    QUERY_TERMS,
    RRF_K,
)
from data_pipeline_for_real_time_retail_analytics_spark.session import get_spark
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

TOP_K = 25
TARGET_FILES = 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("layout-search-example")
    work = tempfile.mkdtemp(prefix="layout_search_")
    raw, zordered = f"{work}/raw", f"{work}/zordered"
    try:
        docs = load_table(spark, sf_dir, "documents")
        # 1. pruning columns, dictionary-coded to integers
        enriched = (
            docs.join(language_id(docs).select("doc_id", "predicted_lang"), "doc_id")
            .join(
                quality_score(docs).select("doc_id", "quality_score"), "doc_id"
            )
            .withColumn(
                "lang_code",
                F.crc32(F.col("predicted_lang")).bitwiseAND(F.lit(0xFFFF)),
            )
            .withColumn(
                "quality_milli", F.round(F.col("quality_score") * 1000, 0).cast("long")
            )
        )
        enriched.write.mode("overwrite").parquet(raw)

        # 2. OPTIMIZE ZORDER on the two pruning dimensions
        zorder_compact(
            spark,
            raw,
            zordered,
            zorder_cols=["lang_code", "quality_milli"],
            target_files=TARGET_FILES,
        )
        en_code = enriched.where(F.col("predicted_lang") == "en").agg(
            F.first("lang_code")
        ).first()[0]
        pruned = spark.read.parquet(zordered).where(
            (F.col("lang_code") == en_code)
            & (F.col("quality_milli") >= 400)
        )
        n_files_total = (
            spark.read.parquet(zordered)
            .select(F.input_file_name())
            .distinct()
            .count()
        )
        n_files_read = pruned.select(F.input_file_name()).distinct().count()
        print(
            f"z-ordered layout: predicate touches {n_files_read}/"
            f"{n_files_total} files for lang=en AND quality>=0.4"
        )

        # 3. hybrid retrieval over the pruned slice
        lex = bm25_scores(pruned, QUERY_TERMS)
        best = lex.orderBy(F.col("bm25").desc(), F.col("doc_id")).first()
        if best is None:
            print(f"no pruned document matches {QUERY_TERMS}")
            return
        print(
            f"query {QUERY_TERMS}: best lexical hit doc {best.doc_id} "
            f"(bm25 {best.bm25})"
        )
        embs = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        # restrict the semantic corpus to the same pruned slice
        slice_embs = embs.join(
            pruned.select(F.col("doc_id").alias("vec_id")), "vec_id"
        )
        qv = embs.where(F.col("vec_id") == best.doc_id)
        sem = cosine_topk(qv, slice_embs, k=TOP_K).select(
            F.col("match_id").alias("doc_id"),
            (-F.col("rank")).alias("sem_order"),
        )
        fused = rrf_fuse(
            [(lex, "bm25"), (sem, "sem_order")], k=RRF_K, top_n=TOP_K
        )
        fused.orderBy(F.col("rrf").desc(), F.col("doc_id")).show(10)
        print(f"fused candidates over the pruned slice: {fused.count()}")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

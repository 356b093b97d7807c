"""Chunk-grain exact deduplication — the ExactSubstr idea of Lee et
al. 2022 ("Deduplicating Training Data Makes Language Models Better")
at fixed token-chunk granularity, the shape production corpora
(CCNet/RefinedWeb-style pipelines) actually ship: drop every repeated
span, not just whole-document copies, keeping the FIRST occurrence
corpus-wide.

Grain choice: a true suffix-array substring dedup is sequential and
memory-resident; the distributed-equivalent contract is "no aligned
k-token chunk appears twice in the surviving corpus", which
parallelizes as hash-partitioned first-occurrence selection — one
shuffle on the chunk hash, one shuffle back to doc grain. Quotes,
mirrored articles, and templated spans land on chunk boundaries often
enough at k=32..128 that this removes the bulk of cross-document
repetition the document-level tiers (exact md5, MinHash) structurally
miss: a 64-token quote inside an otherwise-novel document changes
every document-level signature.

First-occurrence is the (id, position) lexicographic minimum — fully
deterministic, so the DuckDB oracle reproduces it exactly
(plans/chunkdedupq.py).

Scale shape: chunking is a per-row generator (posexplode, no
shuffle); the occurrence rank is a window PARTITIONED BY chunk hash
(each partition = one chunk's occurrence list, bounded by that chunk's
corpus frequency); reassembly is one doc-grain aggregation. Nothing
global, nothing quadratic, state bounded by duplication itself.

Reference parity: the reference has no dedup surface at all (pandas
validation + SQLAlchemy load, src/transformation is dbt scaffolding);
beyond-reference curation suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import chunk_documents, ws_tokens

__all__ = ["chunk_dedup", "plant_quote_docs"]


def chunk_dedup(
    df: DataFrame,
    chunk_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_chunks, n_kept, dedup_text): each document with every
    chunk that already occurred earlier in the corpus (smaller
    (doc_id, chunk_id)) removed, surviving chunks rejoined in order.

    Non-overlapping chunks (overlap=0): overlap would make removal
    ambiguous — dropping one of two overlapping chunks re-includes the
    shared tokens through the other.
    """
    chunks = chunk_documents(
        df, text_col=text_col, id_col=id_col,
        chunk_tokens=chunk_tokens, overlap=0,
    ).select(
        id_col,
        "chunk_id",
        "chunk_text",
        F.md5(F.col("chunk_text")).alias("__h"),
    )
    w = Window.partitionBy("__h").orderBy(id_col, "chunk_id")
    ranked = chunks.withColumn("__rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("__rn") == 1,
        F.struct(F.col("chunk_id"), F.col("chunk_text")),
    )
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count(F.when(F.col("__rn") == 1, 1)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["chunk_text"],
                ),
                " ",
            ).alias("dedup_text"),
        )
    )


def plant_quote_docs(
    df: DataFrame,
    every: int = 50,
    id_offset: int = 20_000_000,
    quote_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Union the corpus with 'quoting' documents: every ``every``-th
    document contributes a new doc whose text is exactly its first
    ``quote_tokens`` tokens. Quotes start at position 0, so their
    chunks are boundary-ALIGNED with the source's — known positives
    for chunk-grain dedup (the document-level near-dup planting,
    plant_near_dups, deliberately shifts tokens and is invisible at
    this grain). ``id_offset`` puts quotes after their sources in the
    first-occurrence order."""
    toks = ws_tokens(F.col(text_col))
    quotes = (
        df.where((F.col(id_col) % every == 0) & (F.size(toks) >= quote_tokens))
        .withColumn(id_col, F.col(id_col) + id_offset)
        .withColumn(
            text_col, F.array_join(F.slice(toks, 1, quote_tokens), " ")
        )
    )
    return df.unionByName(quotes)

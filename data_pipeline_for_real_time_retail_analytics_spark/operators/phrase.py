"""Positional inverted index + exact phrase matching.

The retrieval op BM25 cannot express: "these words ADJACENT, in this
order". The index is the classic positional posting list — one row per
(token, doc, position) — and an n-word phrase match is (n-1)
self-joins on ``(doc, position + offset)``.

Scale shape (why this is the 100 TB design and not ``LIKE '%a b c%'``):

* the index is built ONCE (posexplode over tokens — per-row generator,
  no shuffle) and in production is materialized partitioned/bucketed
  BY TOKEN, so a phrase query reads only its own terms' posting lists
  (partition pruning does the candidate selection);
* the positional joins are keyed on (doc_id, adjusted position) —
  after one shuffle the join is co-partitioned, and each join's left
  side is already restricted to the RAREST term's postings (the
  standard intersection order: candidates never exceed the smallest
  posting list);
* a text scan (`LIKE`/regexp) reads every byte of every document per
  query; the index reads ``Σ df(term)`` rows. At 100 TB that is the
  difference between a full-corpus pass and a few thousand tasks.

Reference parity: the reference has no search surface at all;
beyond-reference retrieval tier next to operators/bm25.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import ws_tokens

__all__ = ["positional_index", "phrase_match_counts"]


def positional_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, tok): one row per token occurrence, 0-based
    position — the positional posting list at corpus grain."""
    return docs.select(
        F.col(id_col),
        F.posexplode(ws_tokens(F.col(text_col))).alias("pos", "tok"),
    )


def phrase_match_counts(
    docs: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_hits) for every document containing the exact
    adjacent token sequence ``phrase`` at least once.

    The join chain anchors on the phrase's FIRST term and intersects
    each subsequent term's postings at the shifted position; distinct
    start positions count as distinct hits (overlapping repeats of a
    self-overlapping phrase each count — the standard positional-index
    semantics)."""
    if len(phrase) < 2:
        raise ValueError("phrase must have >= 2 tokens")
    idx = positional_index(docs, text_col, id_col)
    # per-term postings restricted BEFORE any join: at scale these are
    # partition-pruned posting-list reads, not corpus scans
    out = (
        idx.where(F.col("tok") == phrase[0])
        .select(F.col(id_col), F.col("pos").alias("p0"))
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = idx.where(F.col("tok") == term).select(
            F.col(id_col), (F.col("pos") - i).alias("p0")
        )
        out = out.join(nxt, [id_col, "p0"])
    return out.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )

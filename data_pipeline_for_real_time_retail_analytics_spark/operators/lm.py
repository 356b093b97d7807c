"""Bigram language-model training and scoring — the classic KenLM-style
perplexity filter for LLM corpus curation (docs whose text a corpus-level
n-gram model finds surprising are candidates for removal: OCR noise,
wrong-language spans, garbled markup).

Scale shape (the 100 TB argument):

* **Training** is one explode of the token stream into bigrams followed
  by a single hash-aggregated ``groupBy(w1, w2)`` — map-side partial
  aggregation collapses each partition's stream to its distinct-bigram
  counts before the shuffle, so the shuffle volume is bounded by the
  bigram vocabulary (which grows sub-linearly, Heaps' law), not the
  corpus.
* **Context counts** ``c(w1)`` and the vocabulary size ``V`` are derived
  FROM the bigram-count table (a groupBy over distinct bigrams), never
  from a second corpus scan — the tfidf_top_terms lesson
  (VERDICT r4 ask #6) applied from the start.
* **Scoring** re-explodes the corpus into bigrams and equi-joins the
  count tables on their natural keys. The model side of the join is
  vocabulary-sized; at web scale that is millions of rows against the
  corpus' trillions — AQE picks broadcast when it fits and a hash join
  keyed on a near-uniform token distribution otherwise. No driver-side
  data, no Python in the row path.

Smoothing is add-k over the bigram-participating vocabulary:
``P(w2 | w1) = (c(w1, w2) + k) / (c(w1) + k·V)``. Tokens that only ever
appear as the last token of a document contribute no context row; they
are still scored via the smoothed unseen-bigram mass.

Reference parity: the reference engine has no LM scorer — this is part
of the beyond-reference LLM-pipeline suite mandated by the build brief
(SURVEY.md §6), same family as textstats.py's entropy/quality filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import ws_tokens

__all__ = ["doc_bigrams", "train_bigram_lm", "score_bigram_lm"]


def doc_bigrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Explode each document's whitespace-token stream into adjacent
    (w1, w2) bigram rows. Pure map-side: split → two slices zipped →
    explode; documents with fewer than two tokens vanish (no bigram)."""
    toked = df.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("w"))
    n_pairs = F.greatest(F.size("w") - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice("w", 1, n_pairs).alias("w1"),
        F.slice(F.col("w"), 2, n_pairs).alias("w2"),
    )
    return (
        toked.select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Return ``(bigram_counts, context_counts, vocab_size)``:

    * ``bigram_counts``  — (w1, w2, c12) per distinct bigram,
    * ``context_counts`` — (w1, c1) where c1 = Σ_w2 c12, derived from
      the bigram table (no second corpus pass),
    * ``vocab_size``     — ONE row (v BIGINT): distinct tokens seen in
      any bigram slot, for the add-k denominator.
    """
    bg = doc_bigrams(df, text_col, id_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    context_counts = bigram_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab_size = (
        bigram_counts.select(F.col("w1").alias("t"))
        .union(bigram_counts.select(F.col("w2").alias("t")))
        .agg(F.count_distinct("t").alias("v"))
    )
    return bigram_counts, context_counts, vocab_size


def score_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Per-document average negative log2 probability (bits/bigram —
    log-perplexity) under the add-k-smoothed bigram LM trained on the
    SAME corpus. Output: (id, n_bigrams, nll_bits) for every document
    with ≥ 2 tokens; low-entropy boilerplate scores near 0, token-salad
    scores near log2(V).

    One corpus explode trains, a second scores; the count tables fold
    into one distinct-bigram logp lookup that the scoring stream
    equi-joins once. The 1-row vocab aggregate broadcasts.
    """
    bigram_counts, context_counts, vocab_size = train_bigram_lm(
        df, text_col, id_col
    )
    # Fold the probability model to DISTINCT-bigram grain before it
    # ever meets the occurrence stream (r13, guide §2.3 — aggregate
    # before you shuffle): logp depends only on (c12, c1, v), so it is
    # computed once per distinct bigram in a small counts-table join,
    # and the occurrence stream pays ONE equi-join against that lookup.
    # The pre-r13 shape joined the occurrence table on (w1, w2) and
    # then re-shuffled the full joined occurrence stream AGAIN on (w1)
    # for the context counts — a second corpus-grain exchange carrying
    # text keys. Every scored bigram comes from the SAME corpus the
    # model was trained on (this function trains internally), so the
    # scoring stream is a subset of the lookup's key set by
    # construction and the inner join loses nothing; the logp double
    # is the identical expression on identical inputs, so each
    # quantized micro-unit BIGINT is bit-identical.
    logp = F.log2(
        (F.col("c12").cast("double") + F.lit(float(k)))
        / (F.col("c1").cast("double")
           + F.lit(float(k)) * F.col("v").cast("double"))
    )
    # quantize each bigram's logp to an exact micro-unit BIGINT BEFORE
    # the per-doc average (the bm25/textstats fold-order discipline):
    # AVG over doubles is a multi-addend double SUM, whose fold order
    # differs between Spark partial aggregation and an oracle's scan
    # order — a latent flake at a 0.5e-6 rounding boundary. Both
    # engines compute the same logp double per bigram, the quantized
    # integers agree exactly, and integer addition is associative.
    lookup = (
        bigram_counts.join(context_counts, ["w1"])
        .join(F.broadcast(vocab_size), how="cross")
        .select(
            "w1",
            "w2",
            F.round(logp * F.lit(1_000_000.0), 0)
            .cast("long")
            .alias("logp_micro"),
        )
    )
    scored = doc_bigrams(df, text_col, id_col).join(lookup, ["w1", "w2"])
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -(F.sum("logp_micro").cast("double") / F.lit(1_000_000.0))
                / F.count(F.lit(1)),
                6,
            ).alias("nll_bits"),
        )
    )

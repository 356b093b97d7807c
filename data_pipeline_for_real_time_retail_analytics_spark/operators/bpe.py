"""BPE merge-candidate mining — the first iteration of byte-pair
encoding, distributed the way tokenizer training actually runs at
corpus scale.

Classic BPE (Sennrich et al. 2016) alternates (1) count all adjacent
symbol pairs across the corpus, weighted by word frequency, and
(2) merge the most frequent pair. Step (1) is the data-scale part and
the one worth distributing: at 100 TB the corpus pass reduces to the
word-frequency table FIRST (a vocab-bounded aggregate — Heaps' law
keeps distinct words sub-linear in corpus size), and pair enumeration
then runs over DISTINCT words only, weighted by their counts — never
over raw corpus positions. Step (2)'s argmax is a top-k over the pair
table. The iterative merge loop is a driver-side loop over these two
bounded aggregates (n_merges × two small shuffles), exactly how
production BPE trainers structure it; the repo stages iteration 1 as
the driver-gated pair since each further iteration is the same plan
shape over a rewritten vocab.

Both stages are integer counting on deterministic inputs — exact
cross-engine (DuckDB mirrors with the same substr enumeration).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import ws_tokens


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(tok, wt): corpus word-frequency table over whitespace tokens —
    the vocab-bounded frame every BPE iteration re-reads instead of the
    corpus."""
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(ws_tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("wt"))
    )


def _char_pairs(tok: Column) -> Column:
    """All adjacent character pairs of ``tok`` with multiplicity.

    Guarded for length < 2 (``sequence(1, 0)`` counts DOWN — the
    round-4 lesson), though callers should pre-filter for plan
    cleanliness.
    """
    return F.when(
        F.length(tok) >= 2,
        F.expr(
            "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(pair, n_occurrences): adjacent-character-pair counts over the
    corpus, weighted by word frequency — BPE iteration 1's candidate
    table. A pair occurring twice inside one word counts twice per word
    occurrence (the BPE multiplicity rule)."""
    vocab = word_frequencies(df, text_col).where(F.length("tok") >= 2)
    return (
        vocab.select("wt", F.explode(_char_pairs(F.col("tok"))).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("wt").cast("long").alias("n_occurrences"))
    )


def bpe_top_merges(
    df: DataFrame, k: int, text_col: str = "text"
) -> DataFrame:
    """The top-``k`` merge candidates by weighted pair count, total
    order (count desc, pair asc) so the cut is deterministic."""
    return (
        bpe_pair_counts(df, text_col)
        .orderBy(F.col("n_occurrences").desc(), F.col("pair"))
        .limit(k)
    )

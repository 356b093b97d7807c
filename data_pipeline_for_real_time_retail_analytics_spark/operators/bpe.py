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


def _initial_symbols(tok: Column) -> Column:
    """Character-level initial symbol sequence of ``tok``."""
    return F.expr(
        "transform(sequence(1, length(tok)), i -> substring(tok, i, 1))"
    )


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """One BPE merge applied to a symbol array: replace adjacent
    (a, b) with a||b, greedy left-to-right, non-overlapping — the fold
    never lets a just-created symbol re-merge within the same pass
    (it compares SYMBOLS, and the merged symbol a||b ≠ a unless b is
    empty, which initial char symbols never are)."""
    a_lit, b_lit = F.lit(a), F.lit(b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a_lit)
            & (x == b_lit),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a_lit, b_lit)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    df: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    list [(left_symbol, right_symbol, weighted_count), …] in learned
    order.

    The driver loop is over VOCAB-BOUNDED frames only (the production
    BPE trainer shape — Sennrich et al. 2016 §3.2): each iteration is
    one pair-count aggregate over distinct words (weighted by the word
    frequencies computed once from the corpus) and a 1-row argmax
    collect; the corpus itself is never re-read. The evolving symbol
    column is localCheckpointed per iteration so lineage doesn't
    accumulate one fold per merge (the pointer-jumping/PageRank
    iterative discipline). Ties break (count DESC, pair ASC) —
    deterministic across runs and engines.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0: {n_merges}")
    vocab = (
        word_frequencies(df, text_col)
        .where(F.length("tok") >= 1)
        .select("wt", _initial_symbols(F.col("tok")).alias("syms"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            # guard: a word reduced to ONE symbol has no pairs, and
            # sequence(1, 0) counts DOWN (the r4 word_shingles lesson;
            # under ANSI the out-of-range syms[i] would even error)
            vocab.where(F.size("syms") >= 2)
            .select(
                "wt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS a, syms[i] AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("wt").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0].a, top[0].b, top[0].n
        merges.append((a, b, int(n)))
        vocab = vocab.select(
            "wt", _merge_pair(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint()
    return merges

"""Blocked fuzzy matching — edit-distance entity resolution with a
blocking key (the standard record-linkage decomposition: block to
bound the candidate space, then score candidates exactly).

The capability gap this fills: every dedup tier in operators/dedup.py
keys on SET overlap (shingles, hashes, signatures) — none of them can
say "these two RECORDS are the same entity up to a typo". Levenshtein
distance is the right measure for short identifier-like strings
(names, SKUs, addresses), it is built into BOTH engines as an exact
integer (pyspark ``levenshtein`` / DuckDB ``levenshtein``), and the
all-pairs formulation is quadratic — so the operator takes the classic
shape: a self-equi-join on a BLOCKING key makes the candidate set
Σ |block|², and the distance threshold then filters exactly.

Scale judgment (100 TB): the blocking key is the entire cost model —
blocks must stay bounded (a key with a billion-row block is the
quadratic you were avoiding). The operator therefore exposes
``max_block`` and FAILS LOUDLY when any block exceeds it (the zorder
span-guard precedent: out-of-contract inputs error instead of silently
running a quadratic), because at production scale the fix is a finer
key or multi-pass blocking (several cheap keys union'd for recall),
not a bigger cluster. The canonical-pair convention (id_a < id_b)
halves the join output, and the distance filter runs join-side — only
surviving pairs leave the shuffle.

Reference parity: the reference's quality layer checks exact
uniqueness only (src/quality/validator.py's unique/not_null rules);
fuzzy resolution is net-new surface on the mandated curation side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_fuzzy_pairs"]


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | Column,
    max_dist: int = 2,
    max_block: int = 10_000,
) -> DataFrame:
    """Canonical pairs (id_a, id_b, text_a, text_b, dist) with
    ``levenshtein(text_a, text_b) <= max_dist`` and both rows in the
    same block. ``block_col`` may be a column name or a computed
    expression (e.g. a name prefix). Any block larger than
    ``max_block`` raises at action time — see module docstring."""
    block = F.col(block_col) if isinstance(block_col, str) else block_col
    base = df.select(
        block.alias("__blk"),
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
    )
    # entity tables arrive in few parquet splits; without this the
    # block join's probe side inherits 1-2 input partitions and the
    # O(Σ|block|²) distance work runs near-single-task (measured 63 s →
    # 3.8 s at sf0.1). One small shuffle of (block, id, text) buys
    # block-count-wide parallelism; at 100 TB input splits already
    # abound and the explicit key-partitioning still co-locates blocks.
    base = base.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "__blk"
    )
    # the guard rides the same frame the join consumes: one pass over
    # base computes block sizes; raise_error fires during execution of
    # the join input, so no block ever pays the quadratic
    sizes = base.groupBy("__blk").agg(F.count(F.lit(1)).alias("__bn"))
    guarded = base.join(sizes, "__blk").select(
        F.when(
            F.col("__bn") > max_block,
            F.raise_error(
                f"blocked_fuzzy_pairs: a block exceeds max_block="
                f"{max_block} rows — refine the blocking key "
                "(quadratic guard, see operators/fuzzy.py)"
            ),
        )
        .otherwise(F.col("__blk"))
        .alias("__blk"),
        "id",
        "txt",
    )
    if max_dist == 1:
        return _deletion_neighborhood_pairs(guarded, max_dist)
    a = guarded.select(
        "__blk", F.col("id").alias("id_a"), F.col("txt").alias("text_a")
    )
    b = guarded.select(
        "__blk", F.col("id").alias("id_b"), F.col("txt").alias("text_b")
    )
    return (
        a.join(b, "__blk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.levenshtein("text_a", "text_b") <= max_dist)
        .select(
            "id_a",
            "id_b",
            "text_a",
            "text_b",
            F.levenshtein("text_a", "text_b").cast("int").alias("dist"),
        )
    )


def _deletion_neighborhood_pairs(
    guarded: DataFrame, max_dist: int
) -> DataFrame:
    """``max_dist == 1`` fast path (r13, guide §3.2 — shrink the join
    before shuffling it): the FastSS / deletion-neighborhood candidate
    join. Two strings within one edit of each other MUST share a key in
    ``{s} ∪ {s with one char deleted}``:

    * equality — both carry ``s`` itself;
    * substitution at i — both carry s-del-i;
    * insertion/deletion — the longer string's deletion at the edit
      position IS the shorter string.

    So the blocked all-pairs join (Σ|block|² candidate rows, each
    paying an O(len²) levenshtein DP) becomes an equi-join on
    (block, deletion-key): candidates are key collisions only, and the
    exact DP runs per CANDIDATE, not per pair. Sharing a key is
    necessary but not sufficient (two different deletions can collide
    at distance 2), so the exact threshold filter still verifies every
    emitted pair — the result set is identical to the all-pairs form
    by construction. The max_block guard still rides the input frame
    (out-of-contract blocks fail loudly before any key work runs).

    At 100 TB this is the difference between a per-block quadratic and
    explode-by-(len+1) linear work — the same bounded-candidates
    discipline as the MinHash band join in operators/dedup.py.
    """
    # {txt} ∪ all single-char deletions; array_distinct because a
    # repeated character yields the same variant twice, and an empty
    # string has no deletions (sequence(1, 0) would run DESCENDING —
    # guard it out rather than generate [1, 0])
    dels = F.transform(
        F.sequence(F.lit(1), F.length("txt")),
        lambda i: F.concat(
            F.substring(F.col("txt"), F.lit(1), i - 1),
            F.substring(F.col("txt"), i + 1, F.length("txt")),
        ),
    )
    keys = F.array_distinct(
        F.concat(
            F.array(F.col("txt")),
            F.when(F.length("txt") > 0, dels).otherwise(
                F.array().cast("array<string>")
            ),
        )
    )
    kd = guarded.select(
        "__blk", "id", "txt", F.explode(keys).alias("__k")
    )
    a = kd.select(
        "__blk", "__k", F.col("id").alias("id_a"), F.col("txt").alias("text_a")
    )
    b = kd.select(
        "__blk", "__k", F.col("id").alias("id_b"), F.col("txt").alias("text_b")
    )
    cand = (
        a.join(b, ["__blk", "__k"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "text_a", "text_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.where(F.levenshtein("text_a", "text_b") <= max_dist)
        .select(
            "id_a",
            "id_b",
            "text_a",
            "text_b",
            F.levenshtein("text_a", "text_b").cast("int").alias("dist"),
        )
    )

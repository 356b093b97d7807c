"""KMV (k-minimum-values) distinct-count sketch — mergeable cardinality
estimation over arbitrary value domains (Bar-Yossef et al. 2002, the
bottom-k sketch; the same estimator family DataSketches' theta sketch
ships).

Why a sketch when ``COUNT(DISTINCT x)`` exists: at 100 TB the exact
distinct of a high-cardinality column (corpus token vocabulary, user
ids across a year of events) shuffles every distinct value once, and —
worse — CANNOT be combined across partitions, days, or sources without
re-scanning. A KMV sketch is a fixed k-row summary per group with two
properties that matter at that scale:

* **bounded state**: each partial holds at most k hashes, so the
  partial-aggregate tree moves k rows per group per partition, never
  the distinct set;
* **mergeable**: ``sketch(A ∪ B) = bottom_k(sketch(A) ∪ sketch(B))``
  exactly (min-k of a union is computable from min-k of the parts) —
  per-source or per-day sketches roll up to any coarser grain without
  touching the data again. ``merge_kmv_estimate`` is that roll-up and
  ``tests/test_kmvq.py`` pins it equal to sketching the union directly.

Estimator: with values hashed uniformly onto ``[0, 2^60)`` and
``h_(k)`` the k-th smallest distinct hash, the classic unbiased
estimate is ``(k-1) * 2^60 / h_(k)``; below k distinct values the
sketch holds the whole set and the exact count is returned. Everything
before the single final division is integer (md5-derived 60-bit
hashes, integer ranks), and the one double division is IEEE-exact on
both engines, so estimates compare bit-for-bit against the DuckDB
oracle after the floor(x+0.5) integerization.

Spark-first shape: hashing is map-side; the ``(group, hash)`` DISTINCT
partial-aggregates before its one shuffle; the bottom-k selection runs
as a SALTED TWO-PHASE rank (phase 1 keeps k per (group, salt) — each
window partition sorts ~distinct/n_salts rows, never a whole group's
distinct set in one task; phase 2 ranks the ≤ k·n_salts survivors).
Min-k mergeability is exactly what makes the two-phase result equal to
the global bottom-k, and the DuckDB oracle computes the single-phase
form — the parity check IS the correctness proof of the salted shape.

Reference parity: the reference has no sketch/cardinality surface (its
transformation layer is dbt-declared scaffolding,
config/pipelines/sample_pipeline.yaml:55-99); this extends the mandated
beyond-reference curation suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_hash",
    "distinct_hashes",
    "bottom_k_hashes",
    "kmv_sketch",
    "kmv_estimate",
    "merge_kmv_estimate",
]

#: hash domain: first 15 md5 hex chars = 60 bits, always positive in a
#: BIGINT and exactly representable as a double (2^60 < 2^63)
HASH_BITS = 60
HASH_DOMAIN = float(1 << HASH_BITS)


def kmv_hash(value: Column) -> Column:
    """60-bit md5-derived hash (the established shuffled-shards/DSIR
    family, widened from 8 to 15 hex chars for estimator precision).
    DuckDB mirror: CAST(concat('0x', substr(md5(v), 1, 15)) AS BIGINT).
    """
    return F.conv(F.substring(F.md5(value), 1, 15), 16, 10).cast("long")


def distinct_hashes(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """(*group_cols, h): the per-group distinct 60-bit hash sets — the
    sketch's input, exposed so a plan that ALSO needs the exact distinct
    count materializes this frame once (the shared-frames rule) instead
    of re-scanning the corpus."""
    return df.select(
        *group_cols, kmv_hash(F.col(value_col)).alias("h")
    ).distinct()


def bottom_k_hashes(
    hashed: DataFrame,
    group_cols: list[str],
    k: int = 256,
    n_salts: int = 32,
) -> DataFrame:
    """Per-group bottom-k sketch rows: (*group_cols, rank, h) with
    rank ∈ [1, k] over the group's distinct hashes ascending.

    Salted two-phase selection (see module docstring): no single task
    ever sorts more than ~|distinct|/n_salts + k·n_salts rows.
    """
    salt = (F.col("h") % n_salts).alias("__salt")
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy("h")
    survivors = (
        hashed.select(*group_cols, "h", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("int"))
        .where(F.col("rank") <= k)
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 256,
    n_salts: int = 32,
) -> DataFrame:
    """hash + distinct + bottom-k in one call (the common path)."""
    return bottom_k_hashes(
        distinct_hashes(df, value_col, group_cols), group_cols, k, n_salts
    )


def _estimate(n_kept: Column, kth: Column, k: int) -> Column:
    """floor(est + 0.5) as BIGINT; exact count when the group held
    fewer than k distinct values (the sketch IS the set)."""
    est = (
        F.lit(float(k - 1)) * F.lit(HASH_DOMAIN) / kth.cast("double")
    )
    return (
        F.when(n_kept < k, n_kept.cast("long"))
        .otherwise(F.floor(est + F.lit(0.5)).cast("long"))
        .alias("est_distinct")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 256) -> DataFrame:
    """(*group_cols, n_kept, kth_hash, est_distinct) from sketch rows."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    )
    return agg.select(
        *group_cols,
        "n_kept",
        "kth_hash",
        _estimate(F.col("n_kept"), F.col("kth_hash"), k),
    )


def merge_kmv_estimate(
    sketch: DataFrame, k: int = 256, n_salts: int = 32
) -> DataFrame:
    """Union roll-up: merge every group's sketch rows into ONE estimate
    (n_kept, kth_hash, est_distinct). Exact by min-k mergeability —
    bottom-k of the concatenated sketch rows equals bottom-k of the
    union's distinct hashes, because any hash in the union's true
    bottom-k is necessarily in its own group's bottom-k. Distinct is
    required: the same value (hash) may appear in several groups.

    The selection reuses the salted two-phase ``bottom_k_hashes`` with a
    constant group key: with g merged groups the concatenated sketch is
    g·k rows, and an unpartitioned rank window would push all of them
    through one task — bounded, but a straggler once g is large (one
    sketch per day × source × shard). The salted shape keeps every task
    at ~g·k/n_salts rows instead."""
    merged = bottom_k_hashes(
        sketch.select("h").distinct().withColumn("__g", F.lit(1)),
        ["__g"],
        k,
        n_salts,
    ).drop("__g")
    return merged.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    ).select(
        "n_kept",
        "kth_hash",
        _estimate(F.col("n_kept"), F.col("kth_hash"), k),
    )

"""Containment duplicates — documents whose shingle profile is (almost)
a SUBSET of another document's (Broder 1997's *containment* measure,
the companion to resemblance/Jaccard).

Why a separate operator when MinHash-LSH near-dup exists: Jaccard is
symmetric — a 50-word quote embedded verbatim in a 5,000-word article
has Jaccard ≈ 0.01 and NO Jaccard-threshold tier will ever pair them,
yet the small document is a pure duplicate for training purposes
(truncated crawls, quote wrappers, syndicated excerpts). Containment
``|A ∩ B| / |A|`` is the asymmetric measure that catches exactly this
class, and MinHash bands cannot approximate it (band collision
probability tracks resemblance, not containment) — so candidates come
from a DIRECT rare-shingle equi-join instead of LSH.

Semantics (deterministic, oracle-mirrored): containment is computed
over each document's RARE shingles — those whose corpus document
frequency is ≤ ``df_cap``. The cap is what bounds the self-join
(Σ df² ≤ df_cap · Σ df, linear in the posting lists — the
operators/dedup.py boilerplate precedent), and it is also the right
semantics: a shingle shared by hundreds of documents carries no
containment signal. The threshold test is integer cross-multiplication
(``100·shared ≥ pct·|A_rare|``) — no float in the operator or oracle.

Because document frequency is GLOBAL, a rare shingle of A that occurs
in B is by definition also in B's rare set, so the rare-rare join
loses nothing against "A's rare shingles ∩ all of B".

Spark-first shapes (100 TB): one shingle explode (map-side), one
df aggregation, one df-capped self-equi-join pinned to sort-merge
(``hint("merge")`` — the r7 MinHash band-join lesson: an AQE broadcast
of a derived frame re-executes its subtree and serializes it through
the driver), partial-aggregated pair counts. The shared rare-shingle
frame feeds three consumers (per-doc sizes + both join sides) →
``localCheckpoint`` per the shared-frames rule; at production scale
that materialization goes to storage instead.

Reference parity: the reference has no dedup surface at all (dbt-
declared scaffolding, config/pipelines/sample_pipeline.yaml:55-99);
this extends the mandated LLM-curation suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles

__all__ = ["containment_pairs"]


def containment_pairs(
    df: DataFrame,
    df_cap: int = 25,
    threshold_pct: int = 90,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """Ordered pairs (contained_id, container_id, n_shared,
    n_contained_rare) where ≥ ``threshold_pct``% of the contained
    document's rare shingles occur in the container. Both directions
    of a mutually-containing pair emit (each direction is its own
    claim). Documents with no rare shingle cannot be contained.

    ``materialize=False`` skips the localCheckpoint for callers that
    persist the rare-shingle frame themselves.
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("s"),
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    rare = sh.join(dfreq.where(F.col("df") <= df_cap), "s").select("doc", "s")
    if materialize:
        rare = rare.localCheckpoint()
    n_rare = rare.groupBy("doc").agg(F.count(F.lit(1)).alias("n_contained_rare"))
    a = rare.select(F.col("doc").alias("contained_id"), "s")
    b = rare.select(F.col("doc").alias("container_id"), "s")
    shared = (
        a.join(b.hint("merge"), "s")
        .where(F.col("contained_id") != F.col("container_id"))
        .groupBy("contained_id", "container_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            n_rare.withColumnRenamed("doc", "contained_id"), "contained_id"
        )
        .where(
            F.lit(100) * F.col("n_shared")
            >= F.lit(threshold_pct) * F.col("n_contained_rare")
        )
        .select("contained_id", "container_id", "n_shared", "n_contained_rare")
    )

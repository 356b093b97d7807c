"""Embedding cluster assignment — the semantic-dedup / corpus-mapping
primitive (SemDeDup-style: cluster the embedding space, then prune or
curate within clusters).

Composition over existing pieces: the codebook comes from
``similarity.ivf_centroids`` (deterministic id-ordered seeds, so the
operator is DuckDB-oracle-checkable) or ``ivf_centroids_trained``
(Lloyd-refined, the production path); assignment is one broadcast of
the codebook against the corpus with a struct-max argmax — identical
plan shape to IVF cell assignment (`similarity._assign_cells`), but
keeping the winning similarity, which the curation use-case needs
(distance-to-centroid is the SemDeDup prune key).

Scale: map-side k·dim work per vector plus a one-row-per-vector
partial-aggregated shuffle. No iteration, no driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import dot, l2_norm

__all__ = ["assign_embedding_clusters"]


def assign_embedding_clusters(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid; ties break to the
    HIGHER centroid id (struct-max order — mirrored in the oracle).

    ``centroids`` must expose (cid, cv) as produced by
    ``similarity.ivf_centroids[_trained]``. Output: (id, cluster,
    centroid_sim) with the similarity rounded to 6 places.

    Norms are precomputed per ROW on each side before the broadcast
    join (r13, guide §1.2 per-task work): the naive per-pair
    ``cosine(v, cv)`` re-folds BOTH operands' norms on every one of the
    n·k joined rows — 3 interpreted array folds per pair — where one
    fold per input row suffices. ``dot/(vn·cn)`` is the identical
    expression tree (same doubles, same multiply/divide order), so
    every csim is bit-identical to the naive form and the argmax/oracle
    contract is untouched.
    """
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        l2_norm(F.col(vec_col)).alias("__vn"),
    )
    cents = centroids.select("cid", "cv", l2_norm(F.col("cv")).alias("__cn"))
    sims = c.join(F.broadcast(cents), how="cross").select(
        F.col(id_col),
        F.col("cid"),
        (
            dot(F.col(vec_col), F.col("cv"))
            / (F.col("__vn") * F.col("__cn"))
        ).alias("csim"),
    )
    best = sims.groupBy(id_col).agg(
        F.max(F.struct("csim", "cid")).alias("best")
    )
    return best.select(
        id_col,
        F.col("best.cid").alias("cluster"),
        F.round(F.col("best.csim"), 6).alias("centroid_sim"),
    )

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

from .similarity import cosine

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
    """
    sims = corpus.join(F.broadcast(centroids), how="cross").select(
        F.col(id_col),
        F.col("cid"),
        cosine(F.col(vec_col), F.col("cv")).alias("csim"),
    )
    best = sims.groupBy(id_col).agg(
        F.max(F.struct("csim", "cid")).alias("best")
    )
    return best.select(
        id_col,
        F.col("best.cid").alias("cluster"),
        F.round(F.col("best.csim"), 6).alias("centroid_sim"),
    )

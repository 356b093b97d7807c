"""Semantic benchmark decontamination: flag training vectors whose
embedding nearly matches an eval-set vector.

The embedding-space complement of the n-gram decontaminator
(operators/dedup.py:contaminated_documents, which catches verbatim
leaks): paraphrased or lightly-edited eval examples keep near-identical
embeddings while sharing few 13-grams, so a training-data pipeline runs
BOTH tiers before export. Same sign-LSH blocking as
``similarity.embedding_near_dup_pairs`` — candidates are same-bucket
pairs only (near-identical vectors always share the bucket; recall for
looser thresholds is raised the same way the ANN tier does it,
multi-table bucket union — similarity.py:165), so cost scales with
bucket collisions, never |train|×|eval|.

Scale shape: one map-side bucket hash per vector on each side, an
equi-join on bucket (the eval side is tiny relative to training data —
AQE broadcasts it), and an in-block cosine filter. The removal set is
a distinct projection of the flagged pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import dot, l2_norm, sign_lsh_bucket

__all__ = ["semantic_contamination_pairs", "contaminated_train_ids"]


def semantic_contamination_pairs(
    train: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.99,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(eval_id, train_id, cosine_sim) for every same-bucket pair at or
    above ``threshold`` — the contamination evidence a curation run
    records before dropping the flagged training rows. The threshold
    compares the ROUNDED similarity (6 places), matching
    ``embedding_near_dup_pairs`` and the DuckDB oracle exactly."""
    t = train.select(
        F.col(id_col).alias("train_id"),
        F.col(vec_col).alias("tv"),
        l2_norm(F.col(vec_col)).alias("tn"),
        sign_lsh_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    e = evalset.select(
        F.col(id_col).alias("eval_id"),
        F.col(vec_col).alias("ev"),
        l2_norm(F.col(vec_col)).alias("en"),
        sign_lsh_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    # per-row norms folded before the bucket join (r13); dot/(en·tn) is
    # cosine()'s identical expression tree — bit-identical rounded sims
    sim = F.round(
        dot(F.col("ev"), F.col("tv")) / (F.col("en") * F.col("tn")), 6
    )
    return (
        e.join(t, "bucket")
        .select("eval_id", "train_id", sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= threshold)
    )


def contaminated_train_ids(pairs: DataFrame) -> DataFrame:
    """The removal set: distinct train_id from the flagged pairs —
    left-anti this against the training corpus before export."""
    return pairs.select("train_id").distinct()

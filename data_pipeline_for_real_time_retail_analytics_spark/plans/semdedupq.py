"""Semantic-dedup showcase queries (registry-ready for round 7).

Wraps operators/semdedup.py over the embeddings table: the survivor
set of the within-cluster SemDeDup prune and its per-cluster
accounting. Both have exact DuckDB oracles (the codebook is the
deterministic id-ordered seed set, same as ``embedding_clusters``).

NOT registered in ``__spark_entry__`` this round: the r6 front window
is exactly consumed by the 20 never-green + 30 guard-mandated queries
(see the rotation ledger), and a new registry entry is never-green by
definition — the rotation guard would (correctly) refuse it a tail
slot. The local parity gate (tests/test_semdedup.py) runs the exact
driver comparison in the meantime; flip the registry entries in r7
when slots free. Oracle/int conventions match the driver contract:
identical column names both sides, BIGINT counts, ROUND(x, 6) doubles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.hierassign import assign_two_level, two_level_codebook
from ..operators.semdedup import (
    semdedup_cluster_stats,
    semdedup_member,
    semdedup_member_from_assignment,
    semdedup_prune,
)
from ..operators.similarity import ivf_centroids
from .corpusbase import _embs
from .llm_oracles import _cosine

#: codebook size — same as the proven embedding_clusters query
N_CLUSTERS = 16
#: within-cluster cosine above this = semantic duplicate. The synthetic
#: embeddings are near-isotropic (measured pairwise cosine: max 0.51,
#: p99 0.29 at both sf0.001 and sf0.01), so 0.35 marks the
#: label-cluster tail and prunes a meaningful ~12% without collapsing
#: clusters; a production text-embedding corpus would sit at 0.9+
#: (SemDeDup's web-data sweep) — the threshold is data-scale, not
#: algorithm, dependent.
THRESHOLD = 0.35

#: (applicationId, abspath(sf_dir), flavor) -> localCheckpoint'd member
#: relation ("flat" = broadcast-argmax assignment, "2level" = the
#: coarse→fine router). The assignment subtree feeds three consumers
#: per query (self-join sides + survivor output) and Catalyst
#: duplicates self-join subtrees, so one materialization per flavor
#: shared across the family is the right shape — same pattern as the
#: MinHash pair cache in plans/llm.py.
_MEMBER: dict[tuple[str, str, str], DataFrame] = {}


def clear_caches() -> None:
    """Drop the per-application member-assignment cache (r14, VERDICT
    r13 defect #1): bench.py clears this OUTSIDE every timed window so
    the 2nd+ semdedup-family cells pay their own assignment
    materialization instead of timing a cache hit — the same
    per-cell-full-cost contract as plans/corpusbase.clear_caches."""
    _MEMBER.clear()


def _member(spark: SparkSession, sf_dir: str, flavor: str = "flat") -> DataFrame:
    # abspath key: a relative and an absolute spelling of the same dir
    # must share one materialization (same convention as plans/llm.py)
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), flavor)
    m = _MEMBER.get(key)
    if m is None:
        embs = _embs(spark, sf_dir)
        cents = ivf_centroids(embs, n_cells=N_CLUSTERS)
        if flavor == "flat":
            m = semdedup_member(embs, cents)
        else:
            cb = two_level_codebook(cents, n_coarse=N_COARSE)
            m = semdedup_member_from_assignment(
                assign_two_level(embs, cb), embs
            )
        m = m.localCheckpoint()
        _MEMBER[key] = m
    return m


def _n_salts(spark: SparkSession) -> int:
    """Salt count for the prune's cluster self-join (r13, guide §2.5):
    the demo codebook is a FIXED 16 clusters, so on a P-core cluster
    the join fills at most 16 tasks; ceil(P / k) salts restore full
    parallelism. Derived from the session, not hard-coded, so the
    bench's lower-core drives and a production cluster each get the
    right value (S=1 whenever k >= P — no replication cost)."""
    par = spark.sparkContext.defaultParallelism
    return max(1, -(-par // N_CLUSTERS))


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors of the within-cluster semantic prune, keep='central'
    (operators/semdedup.py:semdedup_prune)."""
    return semdedup_prune(
        threshold=THRESHOLD,
        member=_member(spark, sf_dir),
        n_salts=_n_salts(spark),
    ).orderBy("vec_id")


def q_semantic_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster (members, kept, pruned) accounting of the same prune
    (operators/semdedup.py:semdedup_cluster_stats)."""
    return semdedup_cluster_stats(
        threshold=THRESHOLD,
        member=_member(spark, sf_dir),
        n_salts=_n_salts(spark),
    ).orderBy("cluster")


#: coarse routing seeds for the two-level assignment demo (√k rule)
N_COARSE = 4


def q_embedding_clusters_2level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse→fine codebook assignment of every embedding
    (operators/hierassign.py) — the n·(k₁+k/k₁) scale path for flat
    argmax assignment. Deterministic two-stage rule, exact oracle."""
    embs = _embs(spark, sf_dir)
    cb = two_level_codebook(
        ivf_centroids(embs, n_cells=N_CLUSTERS), n_coarse=N_COARSE
    )
    return assign_two_level(embs, cb).orderBy("vec_id")


def q_semantic_dedup_2level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production composition: SemDeDup prune over the TWO-LEVEL
    assignment's member relation — cluster routing at n·(k₁+k/k₁) cost
    feeding the same bounded within-cluster prune. Proves the two
    operators' shared member contract end to end under the oracle."""
    return semdedup_prune(
        threshold=THRESHOLD,
        member=_member(spark, sf_dir, flavor="2level"),
        n_salts=_n_salts(spark),
    ).orderBy("vec_id")


def _assigned_cte() -> str:
    """Shared oracle CTE: deterministic seed codebook + max-cosine
    assignment — mirrors plans/training.py's embedding_clusters oracle
    (ties to the HIGHER cid, struct-max order)."""
    return rf"""
        cents AS (
            SELECT vec_id AS cid, embedding AS cv
            FROM embeddings ORDER BY vec_id LIMIT {N_CLUSTERS}
        ),
        sims AS (
            SELECT e.vec_id, e.embedding, c.cid,
                   {_cosine("e.embedding", "c.cv")} AS csim
            FROM embeddings e CROSS JOIN cents c
        ),
        assigned AS (
            SELECT vec_id, embedding, cid AS cluster,
                   ROUND(csim, 6) AS centroid_sim
            FROM sims
            QUALIFY row_number() OVER (
                PARTITION BY vec_id ORDER BY csim DESC, cid DESC
            ) = 1
        ),
        dominated AS (
            SELECT DISTINCT a.vec_id
            FROM assigned a
            JOIN assigned b
              ON a.cluster = b.cluster
             AND (b.centroid_sim > a.centroid_sim
                  OR (b.centroid_sim = a.centroid_sim
                      AND b.vec_id < a.vec_id))
             AND {_cosine("a.embedding", "b.embedding")} >= {THRESHOLD}
        )
    """


def _twolevel_cte() -> str:
    """Shared oracle CTE chain ending in ``assigned2``
    (vec_id, embedding, cluster, centroid_sim) — the two-level
    assignment mirrored step for step."""
    return rf"""
        cents AS (
            SELECT vec_id AS cid, embedding AS cv
            FROM embeddings ORDER BY vec_id LIMIT {N_CLUSTERS}
        ),
        seeds AS (SELECT cid AS gcid, cv AS gcv FROM cents
                  ORDER BY gcid LIMIT {N_COARSE}),
        cb AS (
            SELECT c.cid, c.cv, s.gcid AS coarse_cid
            FROM cents c CROSS JOIN seeds s
            QUALIFY row_number() OVER (
                PARTITION BY c.cid
                ORDER BY {_cosine("c.cv", "s.gcv")} DESC, s.gcid DESC
            ) = 1
        ),
        routing AS (SELECT cid AS gcid, cv AS gcv FROM cb
                    WHERE cid = coarse_cid),
        routed AS (
            SELECT e.vec_id, e.embedding, r.gcid
            FROM embeddings e CROSS JOIN routing r
            QUALIFY row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY {_cosine("e.embedding", "r.gcv")} DESC, r.gcid DESC
            ) = 1
        ),
        assigned2 AS (
            SELECT v.vec_id, v.embedding, cb.cid AS cluster,
                   ROUND({_cosine("v.embedding", "cb.cv")}, 6) AS centroid_sim
            FROM routed v JOIN cb ON v.gcid = cb.coarse_cid
            QUALIFY row_number() OVER (
                PARTITION BY v.vec_id
                ORDER BY {_cosine("v.embedding", "cb.cv")} DESC, cb.cid DESC
            ) = 1
        )
    """


ORACLES: dict[str, str] = {
    "semantic_dedup": rf"""
        WITH {_assigned_cte()}
        SELECT vec_id, cluster, centroid_sim
        FROM assigned
        WHERE vec_id NOT IN (SELECT vec_id FROM dominated)
        ORDER BY vec_id
    """,
    "semantic_dedup_stats": rf"""
        WITH {_assigned_cte()},
        kept AS (
            SELECT cluster, COUNT(*) AS n_kept
            FROM assigned
            WHERE vec_id NOT IN (SELECT vec_id FROM dominated)
            GROUP BY cluster
        )
        SELECT a.cluster,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(COALESCE(ANY_VALUE(kept.n_kept), 0) AS BIGINT) AS n_kept,
               CAST(COUNT(*) - COALESCE(ANY_VALUE(kept.n_kept), 0) AS BIGINT)
                   AS n_pruned
        FROM assigned a LEFT JOIN kept ON a.cluster = kept.cluster
        GROUP BY a.cluster
        ORDER BY a.cluster
    """,
    # mirrors hierassign step for step: fine codebook → coarse grouping
    # (ties to higher id at every argmax) → route → within-group argmax
    "embedding_clusters_2level": rf"""
        WITH {_twolevel_cte()}
        SELECT vec_id, cluster, centroid_sim
        FROM assigned2 ORDER BY vec_id
    """,
    # the composition: same dominance prune, but over the two-level
    # assignment's clusters
    "semantic_dedup_2level": rf"""
        WITH {_twolevel_cte()},
        dominated2 AS (
            SELECT DISTINCT a.vec_id
            FROM assigned2 a
            JOIN assigned2 b
              ON a.cluster = b.cluster
             AND (b.centroid_sim > a.centroid_sim
                  OR (b.centroid_sim = a.centroid_sim
                      AND b.vec_id < a.vec_id))
             AND {_cosine("a.embedding", "b.embedding")} >= {THRESHOLD}
        )
        SELECT vec_id, cluster, centroid_sim
        FROM assigned2
        WHERE vec_id NOT IN (SELECT vec_id FROM dominated2)
        ORDER BY vec_id
    """,
}

QUERIES = {
    "semantic_dedup": q_semantic_dedup,
    "semantic_dedup_stats": q_semantic_dedup_stats,
    "embedding_clusters_2level": q_embedding_clusters_2level,
    "semantic_dedup_2level": q_semantic_dedup_2level,
}

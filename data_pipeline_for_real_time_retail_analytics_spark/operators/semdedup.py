"""SemDeDup-style semantic deduplication: prune near-duplicate
embeddings *within* clusters of the embedding space.

Completes the curation arc started by ``embcluster`` (the r5 verdict's
"SemDeDup prep"): cluster assignment gave every vector a (cluster,
centroid_sim) pair; this operator performs the prune itself — inside
each cluster, vectors whose pairwise cosine exceeds ``threshold`` are
semantic duplicates, and exactly one representative per duplicate
neighborhood survives.

Semantics (deterministic, declarative — the "exists a better near-dup"
rule): a vector is PRUNED iff some other vector in the SAME cluster is
(a) within ``threshold`` cosine of it and (b) ranked ahead of it by the
keep priority. With ``keep="central"`` the priority is (centroid_sim
DESC, id ASC) — the most-central member of each duplicate neighborhood
survives; ``keep="edge"`` inverts the similarity order (the SemDeDup
paper, Abbas et al. 2023, reports keeping LOW-centroid-similarity
examples works marginally better for web data). Note this is the
anti-join formulation, not sequential greedy NMS: in a chain a–b, b–c
(a not near c) where a outranks b outranks c, both b and c are pruned
(each has a better in-threshold neighbor), whereas greedy NMS would
revive c after removing b. The anti-join rule needs no iteration and
no order-dependence — one bounded self-join — which is what makes it
both 100 TB-scalable and exactly expressible in the DuckDB oracle
(plans/semdedupq.py).

Scale shape: cluster assignment is a broadcast-codebook argmax (one
row per vector, map-side); the prune is a self-equi-join on cluster —
candidate pairs are bounded by the squared cluster size, never by the
squared corpus. The assignment subtree feeds THREE consumers (both
self-join sides + the survivor output), and Catalyst duplicates
self-join subtrees rather than reusing them, so callers running the
full family should materialize ``semdedup_member`` once and pass it in
(plans/semdedupq.py does; same shared-subexpression pattern as the
MinHash pair cache in plans/llm.py). At 100 TB the codebook comes from
``similarity.ivf_centroids_trained`` on a sample with k sized so n/k
stays a few thousand (k ≈ n/5k keeps every cluster's pair block in one
task); oversized clusters are handled by raising k first. When k is
deliberately SMALL relative to the cluster's cores (a fixed demo
codebook), ``semdedup_prune(n_salts=S)`` splits each cluster's pair
block S ways deterministically — the join-based dominance rule needs
only the pair SET, which salting preserves exactly, so this is safe
parallelism, not an approximation (r13, guide §2.5).

Reference parity: the reference pipeline (hrik21/…retail-analytics)
has no embedding curation at all — this is part of the mandated
beyond-reference LLM-training-data suite, same family as
operators/embcluster.py and operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .embcluster import assign_embedding_clusters
from .similarity import dot, l2_norm

__all__ = [
    "semdedup_member",
    "semdedup_member_from_assignment",
    "semdedup_prune",
    "semdedup_cluster_stats",
]


def semdedup_member(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, centroid_sim, vec) — the cluster assignment joined
    back to its vector. The shared input of the prune family: compute
    (and ``localCheckpoint``) once, pass to ``semdedup_prune`` /
    ``semdedup_cluster_stats`` via ``member=`` so the broadcast-argmax
    assignment runs once instead of once per self-join branch."""
    assigned = assign_embedding_clusters(corpus, centroids, id_col, vec_col)
    return semdedup_member_from_assignment(assigned, corpus, id_col, vec_col)


def semdedup_member_from_assignment(
    assignment: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Member relation from a PRECOMPUTED assignment — any producer of
    the (id, cluster, centroid_sim) contract (the flat argmax or
    ``hierassign.assign_two_level``) joined back to its vector. The one
    definition of the member schema, so every assignment flavor builds
    it identically."""
    return assignment.join(corpus.select(F.col(id_col), F.col(vec_col)), id_col)


def _resolve_member(
    corpus: DataFrame | None,
    centroids: DataFrame | None,
    id_col: str,
    vec_col: str,
    member: DataFrame | None,
) -> DataFrame:
    """Either the caller's precomputed member relation, or one derived
    (and eagerly ``localCheckpoint``'d) from corpus+centroids. The
    default path materializes because the member subtree feeds 3-4
    consumers per query and Catalyst duplicates self-join subtrees —
    without this, one stats call re-runs the n·k codebook argmax four
    times. Pass ``member=`` to control materialization yourself (e.g.
    to share one checkpoint across prune + stats, as
    plans/semdedupq.py does)."""
    if member is not None:
        return member
    if corpus is None or centroids is None:
        raise ValueError(
            "pass either member= or both corpus and centroids"
        )
    return semdedup_member(corpus, centroids, id_col, vec_col).localCheckpoint()


def semdedup_prune(
    corpus: DataFrame | None = None,
    centroids: DataFrame | None = None,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "central",
    member: DataFrame | None = None,
    n_salts: int = 1,
) -> DataFrame:
    """Survivor set of the within-cluster semantic prune.

    ``centroids`` must expose (cid, cv) — ``similarity.ivf_centroids``
    (deterministic, oracle-checkable) or ``ivf_centroids_trained`` (the
    production path). Alternatively pass ``member=`` (a precomputed
    ``semdedup_member`` relation — e.g. built from the two-level
    assigner) and omit corpus/centroids entirely. Output:
    (id_col, cluster, centroid_sim) for every surviving vector,
    centroid_sim rounded to 6 places.

    The keep priority compares the ROUNDED centroid similarity: the
    rounded value is what both engines (and a re-run on different
    partitionings) agree on exactly, so the survivor set is stable
    under plan changes; raw last-ulp drift must not flip who survives.

    ``n_salts`` (r13, guide §2.5): with k clusters and P cores, the
    cluster-keyed self-join fills at most k tasks — when k < P most of
    the cluster idles while each cluster's quadratic pair block runs
    on one core. ``n_salts = S`` splits each block S ways: the a-side gets
    a deterministic salt ``pmod(xxhash64(id), S)``, the b-side is
    replicated S ways, and the join key becomes (cluster, salt) — the
    pair SET is unchanged (each (a, b) matches exactly at b's replica
    s = a's salt), so results are identical. Callers that size k ≥
    cores (the 100 TB contract) keep the default S=1; callers with a
    small fixed codebook derive S from parallelism/k
    (plans/semdedupq.py).
    """
    if keep not in ("central", "edge"):
        raise ValueError(f"keep must be 'central' or 'edge', got {keep!r}")
    member = _resolve_member(corpus, centroids, id_col, vec_col, member)

    # per-ROW norm precompute (r13): the pair predicate below otherwise
    # re-folds both operands' norms on every candidate pair — 3
    # interpreted array folds per pair where cluster-block pair counts
    # are quadratic. dot/(a_n·b_n) is the identical expression tree
    # (same doubles, same multiply/divide order as cosine()), so the
    # dominance set is bit-identical.
    a = member.select(
        F.col("cluster"),
        F.col(id_col).alias("a_id"),
        F.col("centroid_sim").alias("a_sim"),
        F.col(vec_col).alias("av"),
        l2_norm(F.col(vec_col)).alias("a_n"),
    )
    b = member.select(
        F.col("cluster"),
        F.col(id_col).alias("b_id"),
        F.col("centroid_sim").alias("b_sim"),
        F.col(vec_col).alias("bv"),
        l2_norm(F.col(vec_col)).alias("b_n"),
    )
    if keep == "central":
        outranks = (F.col("b_sim") > F.col("a_sim")) | (
            (F.col("b_sim") == F.col("a_sim")) & (F.col("b_id") < F.col("a_id"))
        )
    else:
        outranks = (F.col("b_sim") < F.col("a_sim")) | (
            (F.col("b_sim") == F.col("a_sim")) & (F.col("b_id") < F.col("a_id"))
        )
    # equi-join on cluster first (hash-partitioned, cluster-size-bounded
    # candidate blocks); the rank and cosine predicates filter inside
    # each block — never a cartesian across clusters.
    join_keys = ["cluster"]
    if n_salts > 1:
        a = a.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("a_id")), F.lit(n_salts))
        )
        b = b.withColumn(
            "__salt",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long")
                )
            ),
        )
        join_keys = ["cluster", "__salt"]
    dominated = (
        a.join(b, on=join_keys, how="inner")
        .where(
            outranks
            & (
                dot(F.col("av"), F.col("bv"))
                / (F.col("a_n") * F.col("b_n"))
                >= F.lit(threshold)
            )
        )
        .select(F.col("a_id").alias(id_col))
        .distinct()
    )
    return (
        member.join(dominated, on=id_col, how="left_anti")
        .select(id_col, "cluster", "centroid_sim")
    )


def semdedup_cluster_stats(
    corpus: DataFrame | None = None,
    centroids: DataFrame | None = None,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "central",
    member: DataFrame | None = None,
    n_salts: int = 1,
) -> DataFrame:
    """(cluster, n_members, n_kept, n_pruned) — the per-cluster prune
    accounting a curation run logs to decide whether ``threshold`` (or
    the codebook size) needs retuning before committing the survivor
    set. Same corpus+centroids / ``member=`` contract as
    ``semdedup_prune``; the resolved member is shared with the prune it
    runs internally."""
    member = _resolve_member(corpus, centroids, id_col, vec_col, member)
    kept = semdedup_prune(
        threshold=threshold, id_col=id_col, vec_col=vec_col, keep=keep,
        member=member, n_salts=n_salts,
    )
    members = member.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    survivors = kept.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        members.join(survivors, "cluster", "left")
        .select(
            "cluster",
            "n_members",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            (F.col("n_members") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_pruned"
            ),
        )
    )

"""SemDeDup within-cluster prune (operators/semdedup.py): driver-style
DuckDB parity for the two registry-ready queries plus the structural
invariants the prune rule promises.
"""

import os

import duckdb
import pytest

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.semdedup import (
    semdedup_cluster_stats,
    semdedup_prune,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
    ivf_centroids,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import semdedupq
from data_pipeline_for_real_time_retail_analytics_spark.plans.llm import _embs

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["embeddings"], SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(semdedupq.ORACLES))
def test_parity(spark, ddb, name):
    """Exact driver-gate comparison (shared assert_frames_match)."""
    spark_pdf = semdedupq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(semdedupq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.fixture(scope="module")
def prune_inputs(spark):
    embs = _embs(spark, SF_DIR)
    cents = ivf_centroids(embs, n_cells=semdedupq.N_CLUSTERS)
    return embs, cents


def test_prune_is_nontrivial_and_every_cluster_keeps_one(spark, prune_inputs):
    embs, cents = prune_inputs
    stats = semdedup_cluster_stats(
        embs, cents, threshold=semdedupq.THRESHOLD
    ).collect()
    assert sum(r.n_members for r in stats) == embs.count()
    assert all(r.n_kept + r.n_pruned == r.n_members for r in stats)
    assert all(r.n_kept >= 1 for r in stats), "a cluster lost every member"
    assert sum(r.n_pruned for r in stats) > 0, (
        "threshold prunes nothing — the query is a no-op at this SF"
    )


def test_top_ranked_member_always_survives(spark, prune_inputs):
    """keep='central': the (max centroid_sim, min id) member of every
    cluster is undominatable by construction."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.embcluster import (
        assign_embedding_clusters,
    )

    embs, cents = prune_inputs
    assigned = assign_embedding_clusters(embs, cents).collect()
    best = {}
    for r in assigned:
        cur = best.get(r.cluster)
        rank = (-r.centroid_sim, r.vec_id)
        if cur is None or rank < cur[0]:
            best[r.cluster] = (rank, r.vec_id)
    kept = {
        r.vec_id
        for r in semdedup_prune(embs, cents, threshold=semdedupq.THRESHOLD).collect()
    }
    for cluster, (_, vid) in best.items():
        assert vid in kept, f"cluster {cluster} top member {vid} was pruned"


def test_higher_threshold_prunes_a_subset(spark, prune_inputs):
    """cos >= 0.45 implies cos >= THRESHOLD with identical ranks, so the
    0.45-pruned set must be contained in the THRESHOLD-pruned set."""
    embs, cents = prune_inputs
    loose = {
        r.vec_id
        for r in semdedup_prune(embs, cents, threshold=semdedupq.THRESHOLD).collect()
    }
    tight = {
        r.vec_id for r in semdedup_prune(embs, cents, threshold=0.45).collect()
    }
    assert loose <= tight


def test_keep_edge_keeps_least_central_member(spark, prune_inputs):
    """keep='edge': the (min centroid_sim, min id) member of every
    cluster survives — the SemDeDup-paper variant."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.embcluster import (
        assign_embedding_clusters,
    )

    embs, cents = prune_inputs
    assigned = assign_embedding_clusters(embs, cents).collect()
    worst = {}
    for r in assigned:
        cur = worst.get(r.cluster)
        rank = (r.centroid_sim, r.vec_id)
        if cur is None or rank < cur[0]:
            worst[r.cluster] = (rank, r.vec_id)
    kept = {
        r.vec_id
        for r in semdedup_prune(
            embs, cents, threshold=semdedupq.THRESHOLD, keep="edge"
        ).collect()
    }
    for cluster, (_, vid) in worst.items():
        assert vid in kept, f"cluster {cluster} edge member {vid} was pruned"


def test_bad_keep_mode_rejected(spark, prune_inputs):
    embs, cents = prune_inputs
    with pytest.raises(ValueError, match="keep"):
        semdedup_prune(embs, cents, keep="random")


def test_prune_self_join_is_cluster_equi_join(spark, prune_inputs):
    """With the member relation precomputed, the prune must plan as an
    equi-join on cluster — no cartesian, no broadcast-nested-loop (the
    codebook-argmax BNLJ lives in the assignment, outside this plan)."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.semdedup import (
        semdedup_member,
    )

    embs, cents = prune_inputs
    member = semdedup_member(embs, cents).localCheckpoint()
    df = semdedup_prune(embs, cents, threshold=semdedupq.THRESHOLD, member=member)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_prune_identical_to_unsalted(spark, prune_inputs):
    """r13 salting pin: n_salts splits each cluster's pair block
    deterministically without changing the pair SET, so the survivor
    set and the per-cluster stats must be IDENTICAL at any salt count
    (the bench's local[32] sessions derive S=2 from the fixed 16-cell
    codebook; the oracle drives at <=16 cores run S=1 — this is the
    value pin that covers the S>1 path)."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.semdedup import (
        semdedup_cluster_stats,
    )

    embs, cents = prune_inputs
    for keep in ("central", "edge"):
        a = semdedup_prune(
            embs, cents, threshold=semdedupq.THRESHOLD, keep=keep, n_salts=1
        ).orderBy("vec_id").collect()
        b = semdedup_prune(
            embs, cents, threshold=semdedupq.THRESHOLD, keep=keep, n_salts=5
        ).orderBy("vec_id").collect()
        assert a == b
        assert len(a) > 0
    sa = semdedup_cluster_stats(
        embs, cents, threshold=semdedupq.THRESHOLD, n_salts=1
    ).orderBy("cluster").collect()
    sb = semdedup_cluster_stats(
        embs, cents, threshold=semdedupq.THRESHOLD, n_salts=5
    ).orderBy("cluster").collect()
    assert sa == sb

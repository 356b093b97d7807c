"""Two-level codebook assignment (operators/hierassign.py). DuckDB
parity for the registry-ready query rides tests/test_semdedup.py's
parametrized gate; this file pins the structural promises and the
quality relationship to the flat argmax."""

import os

from data_pipeline_for_real_time_retail_analytics_spark.operators.embcluster import (
    assign_embedding_clusters,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.hierassign import (
    assign_two_level,
    two_level_codebook,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
    ivf_centroids,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import semdedupq
from data_pipeline_for_real_time_retail_analytics_spark.plans.llm import _embs

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _setup(spark):
    embs = _embs(spark, SF_DIR)
    cents = ivf_centroids(embs, n_cells=semdedupq.N_CLUSTERS)
    cb = two_level_codebook(cents, n_coarse=semdedupq.N_COARSE)
    return embs, cents, cb


def test_codebook_grouping_is_total_and_seeds_self_assign(spark):
    embs, cents, cb = _setup(spark)
    rows = cb.collect()
    assert len(rows) == semdedupq.N_CLUSTERS, "grouping must keep every centroid"
    seed_ids = {
        r.cid for r in cents.orderBy("cid").limit(semdedupq.N_COARSE).collect()
    }
    assert {r.coarse_cid for r in rows} <= seed_ids
    for r in rows:
        if r.cid in seed_ids:
            assert r.coarse_cid == r.cid, f"seed {r.cid} must route to itself"


def test_two_level_covers_corpus_with_flat_schema(spark):
    embs, _cents, cb = _setup(spark)
    out = assign_two_level(embs, cb)
    assert out.columns == ["vec_id", "cluster", "centroid_sim"]
    assert out.count() == embs.count()


def test_two_level_never_beats_flat_and_mostly_agrees(spark):
    """Routing through one coarse seed can only LOSE similarity vs the
    flat argmax (IVF n_probe=1 bound), and on this corpus the argmaxes
    should still agree for a solid majority of vectors."""
    embs, cents, cb = _setup(spark)
    flat = {
        r.vec_id: r for r in assign_embedding_clusters(embs, cents).collect()
    }
    two = {r.vec_id: r for r in assign_two_level(embs, cb).collect()}
    assert set(flat) == set(two)
    agree = 0
    for vid, f in flat.items():
        t = two[vid]
        assert t.centroid_sim <= f.centroid_sim + 1e-9, (
            f"{vid}: two-level sim {t.centroid_sim} beats flat {f.centroid_sim}"
        )
        agree += t.cluster == f.cluster
    assert agree / len(flat) > 0.5, f"only {agree}/{len(flat)} agree with flat"


def test_prune_composes_with_two_level_member(spark):
    """semdedup_prune consumes a member relation built from the
    two-level assignment unchanged (drop-in output contract)."""
    from pyspark.sql import functions as F

    from data_pipeline_for_real_time_retail_analytics_spark.operators.semdedup import (
        semdedup_prune,
    )

    embs, _cents, cb = _setup(spark)
    member = assign_two_level(embs, cb).join(
        embs.select("vec_id", "embedding"), "vec_id"
    )
    kept = semdedup_prune(
        embs, None, threshold=semdedupq.THRESHOLD, member=member
    )
    stats = (
        member.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    ).collect()
    kept_by_cluster = {
        r.cluster: r.n
        for r in kept.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0 < kept.count() <= embs.count()
    for r in stats:
        assert kept_by_cluster.get(r.cluster, 0) >= 1

#!/usr/bin/env python
"""Semantic-curation walk: embed-space clustering → SemDeDup prune →
corpus roll-forward of the composition stats.

The LLM-curation shape this demonstrates end to end:

1. cluster the embedding space with a deterministic codebook
   (``ivf_centroids``; a deployment would Lloyd-train on a sample);
2. prune semantic near-duplicates INSIDE each cluster — one bounded
   self-join, keep-central priority (``semdedup_prune``);
3. restrict the document corpus to the surviving vectors;
4. advance the standing corpus-composition aggregate (docs + chars by
   source) from the prune's delete changelog — never re-aggregating
   the corpus (``apply_changelog_to_agg``). The walk verifies the
   rolled aggregate equals a direct recompute on the kept documents.

Step 4 is the point at scale: a 100 TB curation pass touches a few
percent of rows; its bookkeeping should cost changelog-sized work, not
corpus-sized work.

Run:  python examples/semantic_curation_example.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.aggmaint import (
    aggregate_snapshot,
    apply_changelog_to_agg,
    changelog_with_preimage,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.semdedup import (
    semdedup_cluster_stats,
    semdedup_member,
    semdedup_prune,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
    ivf_centroids,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.semdedupq import (
    N_CLUSTERS,
    THRESHOLD,
)
from data_pipeline_for_real_time_retail_analytics_spark.session import get_spark
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("semantic-curation-example")

    embs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = ivf_centroids(embs, n_cells=N_CLUSTERS)
    # one materialization feeds the prune's self-join sides AND the
    # stats — the shared-subexpression shape the operator docstring
    # prescribes
    member = semdedup_member(embs, cents).localCheckpoint()
    print(f"vectors: {member.count()} in {N_CLUSTERS} clusters")

    kept_vecs = semdedup_prune(
        embs, cents, threshold=THRESHOLD, member=member
    )
    stats = semdedup_cluster_stats(
        embs, cents, threshold=THRESHOLD, member=member
    )
    pruned = stats.agg(F.sum("n_pruned")).first()[0]
    print(f"pruned: {pruned} semantic near-dups (threshold {THRESHOLD})")
    stats.orderBy(F.desc("n_pruned")).show(5, truncate=False)

    # vec_id is the embedding of doc_id — restrict the corpus
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    kept_docs = docs.join(
        kept_vecs.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )

    # roll the composition aggregate forward from the prune changelog
    spec = {"total_chars": "n_chars"}
    before = aggregate_snapshot(docs, ["source"], spec, count_col="n_docs")
    changelog = changelog_with_preimage(
        docs, kept_docs, ["doc_id"], ["source", "n_chars"]
    )
    after = apply_changelog_to_agg(
        before, changelog, ["source"], spec, count_col="n_docs"
    )
    direct = aggregate_snapshot(kept_docs, ["source"], spec, count_col="n_docs")

    rolled = {r.source: (r.n_docs, r.total_chars) for r in after.collect()}
    check = {r.source: (r.n_docs, r.total_chars) for r in direct.collect()}
    print(f"kept docs: {sum(v[0] for v in rolled.values())}")
    print(f"rolled == direct recompute: {rolled == check}")
    after.orderBy("source").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()

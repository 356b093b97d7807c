"""Recall harness for the approximate-nearest-neighbor tiers.

Hash-match against the DuckDB oracle (test_oracle_parity.py) proves each
ANN tier is *deterministic*; this file proves the approximation is
*good* — recall@k against the exact ``cosine_topk`` ground truth.

Two corpora, because recall is a property of data + parameters, not of
the algorithm alone:

1. **Planted clusters** (the near-dup retrieval case these tiers target
   in an LLM-data pipeline): base vectors plus small perturbations whose
   true neighbors are their own cluster. Recall floors here are
   meaningful and asserted.
2. **The synthetic test corpus** (``embeddings.parquet``): essentially
   isotropic random 64-dim vectors — true top-5 sits at cosine ≈ 0.38
   with no cluster structure, so single-table 8-bit sign-LSH *cannot*
   recall it (P[same bucket] = p^8 ≈ 0.02 at per-bit agreement p ≈ 0.62).
   We assert the *ordering* the theory predicts (amplification: multi-
   table > multi-probe > single-probe) rather than pretending to floors
   no candidate-bounded method can reach on structureless data. Measured
   numbers are in NOTES.md round 5.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
    ann_topk_ivf,
    ann_topk_sign_lsh,
    ann_topk_sign_lsh_multiprobe,
    ann_topk_sign_lsh_multitable,
    cosine_topk,
)
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

DIM = 64
N_BASE = 60
COPIES = 4  # perturbed copies per planted cluster


def _topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["match_id"])
    return out


def _recall(approx: dict, truth: dict) -> float:
    per_q = [len(approx.get(q, set()) & t) / len(t) for q, t in truth.items()]
    return sum(per_q) / len(per_q)


@pytest.fixture(scope="module")
def clustered(spark):
    """Deterministic planted-cluster corpus: every 5th base vector gets
    COPIES perturbed twins at cosine ≈ 0.99 — its true top-k."""
    rng = np.random.RandomState(7)
    base = rng.randn(N_BASE, DIM)
    rows = []
    next_id = 0
    query_ids = []
    for i in range(N_BASE):
        vid = next_id
        rows.append((vid, [float(x) for x in base[i]]))
        next_id += 1
        if i % 5 == 0:
            query_ids.append(vid)
            for _ in range(COPIES):
                twin = base[i] + 0.08 * rng.randn(DIM)  # cos ≈ 0.985-0.995
                rows.append((next_id, [float(x) for x in twin]))
                next_id += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, query_ids


def test_recall_on_planted_clusters(spark, clustered):
    corpus, query_ids = clustered
    queries = corpus.where(F.col("vec_id").isin(query_ids))
    truth = _topk_sets(cosine_topk(queries, corpus, k=COPIES))

    single = _recall(
        _topk_sets(ann_topk_sign_lsh(queries, corpus, k=COPIES, n_bits=8)), truth
    )
    multiprobe = _recall(
        _topk_sets(
            ann_topk_sign_lsh_multiprobe(queries, corpus, k=COPIES, n_bits=8)
        ),
        truth,
    )
    multitable = _recall(
        _topk_sets(
            ann_topk_sign_lsh_multitable(
                queries, corpus, k=COPIES, n_bits=8, n_tables=4
            )
        ),
        truth,
    )
    ivf = _recall(
        _topk_sets(ann_topk_ivf(queries, corpus, k=COPIES, n_cells=8, n_probe=2)),
        truth,
    )
    # floors derived from the collision math at per-bit agreement
    # p ≈ 0.95 (cos 0.99): single p^8 ≈ 0.66; multiprobe adds the 1-flip
    # mass (≈ 0.93); 4 tables: 1-(1-0.66)^4 ≈ 0.99; IVF: perturbed twins
    # share the base's nearest centroid almost surely.
    assert single >= 0.5, f"single-table recall {single}"
    assert multiprobe >= 0.85, f"multiprobe recall {multiprobe}"
    assert multitable >= 0.9, f"multitable recall {multitable}"
    assert ivf >= 0.8, f"ivf recall {ivf}"


def test_amplification_ordering_on_real_corpus(spark, sf_dir):
    """On the structureless synthetic corpus no bounded method can hit
    high absolute recall; what MUST hold is the amplification ordering —
    each recall dial strictly widens the candidate set it draws from."""
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") % 100 == 0)
    truth = _topk_sets(cosine_topk(queries, embs, k=5))

    single = _recall(_topk_sets(ann_topk_sign_lsh(queries, embs, k=5, n_bits=8)), truth)
    multiprobe = _recall(
        _topk_sets(ann_topk_sign_lsh_multiprobe(queries, embs, k=5, n_bits=8)), truth
    )
    multitable = _recall(
        _topk_sets(
            ann_topk_sign_lsh_multitable(queries, embs, k=5, n_bits=4, n_tables=8)
        ),
        truth,
    )
    assert multiprobe >= single
    assert multitable >= multiprobe
    # 8×4-bit tables must recover a non-trivial fraction even here
    # (theory: 1-(1-p^4)^8 ≈ 0.7 at p ≈ 0.62)
    assert multitable >= 0.4, f"multitable recall {multitable}"


def test_multitable_rejects_out_of_range_tables(spark, clustered):
    """n_tables*n_bits beyond the embedding dimension must fail eagerly
    when dim is declared — silently single-bucket tables (non-ANSI NULL
    comparison) are a per-table cross product at scale."""
    corpus, _ = clustered
    with pytest.raises(ValueError, match="exceeds the embedding dimension"):
        ann_topk_sign_lsh_multitable(corpus, corpus, n_bits=8, n_tables=16, dim=64)


def test_pq_adc_recall_on_planted_clusters(spark, clustered):
    """PQ asymmetric-distance top-k must recall planted twins: a 0.08-σ
    perturbation is tiny against sub-centroid spacing, so twins collapse
    to (near-)identical code words and ADC separates cluster from
    non-cluster distances cleanly. Both the deterministic seed codebook
    (the oracle-checked path) and the Lloyd-trained one must clear the
    floor (measured: 1.0 for both)."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.pq import (
        pq_adc_topk,
        pq_codebooks,
        pq_codebooks_trained,
    )

    corpus, query_ids = clustered
    queries = corpus.where(F.col("vec_id").isin(query_ids))
    truth = _topk_sets(cosine_topk(queries, corpus, k=COPIES))

    seed_cb = pq_codebooks(corpus, m=8, k=16)
    seed = _recall(
        _topk_sets(pq_adc_topk(queries, corpus, seed_cb, k=COPIES)), truth
    )
    trained_cb = pq_codebooks_trained(corpus, m=8, k=16, n_iters=4)
    trained = _recall(
        _topk_sets(pq_adc_topk(queries, corpus, trained_cb, k=COPIES)), truth
    )
    assert seed >= 0.9, f"seed-codebook ADC recall {seed}"
    assert trained >= 0.9, f"trained-codebook ADC recall {trained}"


def test_pq_rerank_dominates_adc_head(spark, sf_dir):
    """Structural invariant of shortlist re-ranking: within the same
    ADC shortlist, every true-top-k member present beats every
    non-member on EXACT distance, so exact re-ranking's recall can
    never fall below the raw ADC head's — even on the structureless
    synthetic corpus where absolute recall is low."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.pq import (
        _qdist,
        pq_adc_topk,
        pq_codebooks_trained,
    )
    from pyspark.sql import Window

    embs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = embs.where(F.col("vec_id") % 100 == 0)
    qv = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    k, shortlist_n = 5, 20
    # truth in the SAME metric the rerank uses (exact squared L2):
    # within one shortlist every true-top-k member beats every
    # non-member on that metric, which is what makes the dominance
    # structural rather than statistical
    truth = _topk_sets(
        qv.join(embs, how="cross")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            _qdist(F.col("qv"), F.col("embedding")).alias("d"),
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d", "match_id")
            ),
        )
        .where(F.col("r") <= k)
    )

    cb = pq_codebooks_trained(embs, m=16, k=16, n_iters=4)
    shortlist = pq_adc_topk(queries, embs, cb, k=shortlist_n)
    head = _recall(
        _topk_sets(shortlist.where(F.col("rank") <= k)), truth
    )
    rerank_df = (
        shortlist.withColumnRenamed("match_id", "vec_id")
        .join(embs, "vec_id")
        .join(qv, "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            _qdist(F.col("qv"), F.col("embedding")).alias("d"),
        )
        .withColumn(
            "rr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d", "match_id")
            ),
        )
        .where(F.col("rr") <= k)
    )
    reranked = _recall(_topk_sets(rerank_df), truth)
    assert reranked >= head, f"rerank {reranked} < adc head {head}"

"""Unit tests for the training-data-export operators (operators/lm.py,
operators/packing.py, operators/embcluster.py). Cross-engine value
parity is covered by test_oracle_parity; these pin semantics and the
scale-relevant plan shapes."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.embcluster import (
    assign_embedding_clusters,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.lm import (
    doc_bigrams,
    score_bigram_lm,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.packing import (
    pack_sequences,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
    ivf_centroids,
)


# ---------------------------------------------------------------- lm --


def test_doc_bigrams_counts_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, ""), (4, "x y")],
        ["doc_id", "text"],
    )
    rows = doc_bigrams(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.w1, r.w2))
    # n_tokens - 1 bigrams, in order; <2-token docs emit nothing
    assert sorted(by_doc[1]) == [("a", "b"), ("b", "c")]
    assert by_doc[4] == [("x", "y")]
    assert 2 not in by_doc and 3 not in by_doc


def test_lm_scores_repetition_below_salad(spark):
    """A doc of one repeated bigram must score (near) the corpus floor;
    a doc that uses each transition once scores strictly higher."""
    df = spark.createDataFrame(
        [
            (1, "the the the the the the the the"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in score_bigram_lm(df).collect()}
    assert out[1].n_bigrams == 7 and out[2].n_bigrams == 7
    assert out[1].nll_bits < out[2].nll_bits
    assert out[1].nll_bits >= 0.0


def test_lm_smoothing_handles_unseen_mass(spark):
    """All probabilities are < 1 and finite — the add-k denominator
    includes k·V so even the deterministic transition pays some mass."""
    df = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    row = score_bigram_lm(df).collect()[0]
    assert row.nll_bits > 0.0  # P < 1 everywhere under smoothing


# ----------------------------------------------------------- packing --


def _packing_input(spark):
    # irregular lengths and an id gap: layout must follow id order
    rows = [(i, (i * 37) % 23 + 1) for i in range(40) if i != 17]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"])


def test_packing_matches_serial_reference(spark):
    df = _packing_input(spark)
    out = {
        r.doc_id: r
        for r in pack_sequences(df, "doc_id", "n_tokens", seq_len=50).collect()
    }
    cum = 0
    for doc_id, n in sorted(df.collect()):
        r = out[doc_id]
        assert r.seq_id == cum // 50 and r.offset_in_seq == cum % 50, doc_id
        cum += n
    assert len(out) == df.count()


@pytest.mark.parametrize("span", [1, 7, 1000])
def test_packing_bucket_span_invariance(spark, span):
    """Any bucket_span yields the identical layout — the distributed
    prefix-sum is an implementation detail, not a semantic knob."""
    df = _packing_input(spark)
    base = sorted(
        pack_sequences(df, "doc_id", "n_tokens", seq_len=64, bucket_span=64)
        .collect()
    )
    other = sorted(
        pack_sequences(df, "doc_id", "n_tokens", seq_len=64, bucket_span=span)
        .collect()
    )
    assert base == other


def test_packing_window_is_bucket_partitioned(spark):
    """The per-document window must partition by bucket (parallel), not
    run a global unpartitioned ORDER BY over the corpus."""
    df = _packing_input(spark)
    plan = (
        pack_sequences(df, "doc_id", "n_tokens", seq_len=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "windowspecdefinition(bkt" in plan
    assert "CartesianProduct" not in plan


def test_shuffle_shards_is_total_permutation(spark):
    from data_pipeline_for_real_time_retail_analytics_spark.operators.packing import (
        shuffle_shards,
    )

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(df, "doc_id", n_shards=8).collect()
    assert len(out) == 200 and len({r.doc_id for r in out}) == 200
    by_shard = {}
    for r in out:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.pos)
    # positions are 1..len per shard — gap-free addressing for readers
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # deterministic across invocations and partitionings
    again = shuffle_shards(df.repartition(13), "doc_id", n_shards=8).collect()
    assert sorted(out) == sorted(again)
    # a different seed yields a different permutation
    other = shuffle_shards(df, "doc_id", n_shards=8, seed=1).collect()
    assert sorted(out) != sorted(other)


def test_shuffle_shards_window_is_shard_partitioned(spark):
    from data_pipeline_for_real_time_retail_analytics_spark.operators.packing import (
        shuffle_shards,
    )

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = (
        shuffle_shards(df, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "windowspecdefinition(shard" in plan


def test_packing_rejects_bad_params(spark):
    df = _packing_input(spark)
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_tokens", seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n_tokens", seq_len=8, bucket_span=-1)


def test_lm_skewed_context_partial_aggregates(spark):
    """Skew stress (same protocol as the tfidf pin): one hot context
    word opens every even doc. The bigram/context-count aggregates are
    term-keyed — they must keep their map-side partial phase so the hot
    key reaches the exchange as one row per input partition, and the
    hot context's count must come out exact."""
    n = 20_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("hot ")).otherwise(F.lit("")),
            F.lit("u"),
            F.col("id").cast("string"),
            F.lit(" v"),
            F.col("id").cast("string"),
        ).alias("text"),
    ).repartition(16)

    from data_pipeline_for_real_time_retail_analytics_spark.operators.lm import (
        train_bigram_lm,
    )

    bigram_counts, context_counts, _ = train_bigram_lm(docs)
    plan = bigram_counts._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, "bigram count lost map-side combine"
    hot = context_counts.where(F.col("w1") == "hot").collect()
    # even docs: "hot u<i> v<i>" → exactly one bigram with context "hot"
    assert [r["c1"] for r in hot] == [n // 2]


# -------------------------------------------------------- embcluster --


def test_seed_vectors_join_their_own_cluster(spark):
    embs = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 1.0, 0.0]),
            Row(vec_id=2, embedding=[0.9, 0.1, 0.0]),
            Row(vec_id=3, embedding=[0.0, 0.9, 0.2]),
        ]
    )
    cents = ivf_centroids(embs, n_cells=2)
    out = {r.vec_id: r for r in assign_embedding_clusters(embs, cents).collect()}
    assert out[0].cluster == 0 and out[0].centroid_sim == 1.0
    assert out[1].cluster == 1 and out[1].centroid_sim == 1.0
    assert out[2].cluster == 0 and out[3].cluster == 1
    assert all(0.0 <= r.centroid_sim <= 1.0 for r in out.values())


def test_cluster_assignment_broadcasts_codebook(spark, sf_dir):
    from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

    embs = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(embs, n_cells=4)
    plan = (
        assign_embedding_clusters(embs, cents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # broadcast of the bounded codebook is the intended 100 TB shape;
    # the corpus side must partial-aggregate (one row per vector out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "partial_max" in plan or "partial" in plan.lower()

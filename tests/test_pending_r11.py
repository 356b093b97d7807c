"""The r10-staged round-11 pairs (plans/pending_r11.py): driver-identical
DuckDB parity for each, plus the semantic pins that make the families
trustworthy beyond the hash match — the as-of tolerance really cuts at
the boundary, the Bloom filter really has no false negatives (and its
FP accounting survives a deliberately saturated filter), and the
temperature quota really flattens the head language."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.asof import (
    asof_join_backward,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.bloomfilter import (
    bloom_bits,
    bloom_probe,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import (
    bloomdedupq,
    langquotaq,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r11 import (
    PENDING_ORACLES,
    PENDING_QUERIES,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(
        duckdb.connect(),
        ["events", "documents", "embeddings", "orders", "customer"],
        SF_DIR,
    )
    yield con
    con.close()


def test_pending_r11_aggregates_the_staged_pairs():
    """State-aware from day one (the r8 lesson): green while staged,
    green at the r11 flip, green after."""
    from test_rotation_update import _assert_pending_module_consistent

    assert set(PENDING_QUERIES) == {
        "purchase_click_asof", "bloom_chunk_prefilter", "lang_quality_mix",
        "phrase_search", "length_bucket_stats", "stream_events_value_drift",
        "curation_funnel", "label_centroid_shift", "dup_cluster_sizes",
        "robust_outlier_events", "pair_jaccard_histogram",
        "priority_sample_docs", "incremental_ann_new_vecs",
        "source_overlap_matrix", "stream_kmv_distinct_bigrams",
        "click_error_interval", "bpe_merge_candidates",
        "revenue_trend_by_segment", "daily_new_vs_returning",
        "event_count_cusum",
    }
    _assert_pending_module_consistent(PENDING_QUERIES, PENDING_ORACLES)


@pytest.mark.parametrize("name", sorted(PENDING_QUERIES))
def test_parity(spark, ddb, name):
    spark_pdf = PENDING_QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(PENDING_ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


# ---------- as-of tolerance ----------


def test_asof_tolerance_cuts_exactly_at_the_boundary(spark):
    """gap == tolerance is KEPT (<=), one microsecond more is dropped;
    an exact-timestamp click matches; a user with only later clicks
    gets NULL."""
    left = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 01:00:00"),          # gap exactly 600s
            (2, 20, "2024-01-01 01:00:00.000001"),   # 600s + 1us
            (3, 30, "2024-01-01 00:50:00"),          # exact-ts match
            (4, 40, "2024-01-01 00:00:00"),          # click only later
        ],
        "purchase_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (10, "2024-01-01 00:50:00", 100),
            (20, "2024-01-01 00:50:00", 200),
            (30, "2024-01-01 00:50:00", 300),
            (40, "2024-01-01 02:00:00", 400),
        ],
        "user_id long, ts string, click_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.purchase_id: r.click_id
        for r in asof_join_backward(
            left, right, key_cols=["user_id"], ts_col="ts",
            right_value_cols=["click_id"], tolerance_seconds=600,
        ).collect()
    }
    assert out == {1: 100, 2: None, 3: 300, 4: None}


def test_asof_matched_ts_col_surfaces_the_match(spark):
    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 01:00:00")],
        "pid long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:59:00", 7)],
        "user_id long, ts string, click_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    row = asof_join_backward(
        left, right, key_cols=["user_id"], ts_col="ts",
        right_value_cols=["click_id"], tolerance_seconds=3600,
        matched_ts_col="click_ts",
    ).collect()[0]
    assert row.click_id == 7 and str(row.click_ts).startswith("2024-01-01 00:59")


def test_asof_rejects_silent_column_clobbers(spark):
    """A right value column (or matched_ts_col) sharing a name with a
    left column would be silently overwritten by the payload unpack —
    rejected loudly; reserved working names likewise (the rangejoin.py
    discipline)."""
    import pytest

    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 01:00:00", 5)],
        "pid long, user_id long, ts string, click_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:59:00", 7)],
        "user_id long, ts string, click_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(ValueError, match="overwrite"):
        asof_join_backward(
            left, right, key_cols=["user_id"], ts_col="ts",
            right_value_cols=["click_id"],
        )
    with pytest.raises(ValueError, match="overwrite"):
        asof_join_backward(
            left.drop("click_id"), right, key_cols=["user_id"], ts_col="ts",
            right_value_cols=["click_id"], matched_ts_col="pid",
        )
    with pytest.raises(ValueError, match="reserved"):
        asof_join_backward(
            left.withColumnRenamed("click_id", "__asof_payload"), right,
            key_cols=["user_id"], ts_col="ts", right_value_cols=["click_id"],
        )
    # matched_ts_col colliding with a right_value_cols entry passed the
    # left-side guard but still clobbered the matched-timestamp column
    # in the unpack loop (r11 ADVICE) — now rejected, as are duplicate
    # right_value_cols (last unpack silently wins otherwise)
    with pytest.raises(ValueError, match="matched_ts_col"):
        asof_join_backward(
            left.drop("click_id"), right, key_cols=["user_id"], ts_col="ts",
            right_value_cols=["click_id"], matched_ts_col="click_id",
        )
    with pytest.raises(ValueError, match="duplicate"):
        asof_join_backward(
            left.drop("click_id"), right, key_cols=["user_id"], ts_col="ts",
            right_value_cols=["click_id", "click_id"],
        )


# ---------- bloom pre-filter ----------


def test_bloom_no_false_negatives_and_tail_is_novel(spark):
    """Bloom law: every verified duplicate was a hit (no false
    negatives), and the generator's contract holds — exactly one
    mutated tail chunk per re-ingested doc is novel."""
    rows = bloomdedupq.q_bloom_chunk_prefilter(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_hit >= r.n_verified, "false negative — impossible for Bloom"
        assert r.n_false_pos == r.n_hit - r.n_verified
        assert r.n_verified == r.n_chunks - 1, (
            "all aligned prefix chunks must verify; only the mutated "
            f"tail is novel (doc {r.doc_id})"
        )


def test_bloom_fp_accounting_under_saturation(spark):
    """Force false positives with a deliberately tiny filter (m=64):
    novel probe keys collide with set bits, n_false_pos goes positive,
    and membership still never misses a present key."""
    corpus = spark.createDataFrame(
        [(f"key{i}",) for i in range(200)], "h string"
    )
    probes = spark.createDataFrame(
        [(f"key{i}",) for i in range(150, 250)], "h string"
    )
    flags = {
        r.h: r.bloom_hit
        for r in bloom_probe(
            probes, "h", bloom_bits(corpus, "h", m=64, k=3), m=64, k=3
        ).collect()
    }
    present = [f"key{i}" for i in range(150, 200)]
    novel = [f"key{i}" for i in range(200, 250)]
    assert all(flags[k] for k in present), "present key missed"
    n_fp = sum(1 for k in novel if flags[k])
    # 200 keys x 3 rows into 64 positions saturates the table; a novel
    # key passing all 3 probes is near-certain for at least one of 50
    assert n_fp > 0, "saturated filter produced zero FPs — probe broken?"
    assert n_fp < 50 or True  # accounting, not an FP-rate claim


def test_bloom_bits_bounded_by_k_times_m(spark):
    corpus = spark.createDataFrame(
        [(f"key{i}",) for i in range(500)], "h string"
    )
    bits = bloom_bits(corpus, "h", m=32, k=3).collect()
    assert len(bits) <= 3 * 32
    assert len(set((b.bit_row, b.bit_pos) for b in bits)) == len(bits)


def test_bloom_rejects_degenerate_params(spark):
    """m < 1 is a mod-by-zero (silently empty filter); k < 1 makes
    every probe a vacuous hit — both loud errors."""
    import pytest

    from data_pipeline_for_real_time_retail_analytics_spark.operators.bloomfilter import (
        bloom_probe,
    )

    corpus = spark.createDataFrame([("a",)], "h string")
    with pytest.raises(ValueError, match="m"):
        bloom_bits(corpus, "h", m=0)
    with pytest.raises(ValueError, match="k"):
        bloom_bits(corpus, "h", m=8, k=0)
    bits = bloom_bits(corpus, "h", m=8, k=2)
    with pytest.raises(ValueError, match="k"):
        bloom_probe(corpus, "h", bits, m=8, k=-1)


# ---------- per-language quality quota ----------


def test_stream_drift_equals_batch_engine_side(spark):
    """The drained streaming PSI equals the batch twin row-for-row ON
    THE ENGINE (the oracle gate proves it against DuckDB; this pins the
    two Spark paths against each other directly)."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import (
        driftq,
        streamdriftq,
    )

    s = streamdriftq.q_stream_events_value_drift(spark, SF_DIR).collect()
    b = driftq.QUERIES["events_value_drift"](spark, SF_DIR).collect()
    assert s == b


def test_curation_funnel_laws(spark):
    """Funnel laws on real output: counts/tokens monotone non-
    increasing; stage 1 drops EXACTLY the planted exact copies; the
    planted quote docs survive stages 1-2 and die at span_clean."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import funnelq
    from data_pipeline_for_real_time_retail_analytics_spark.sources import (
        load_table,
    )
    import pyspark.sql.functions as SF

    rows = {r.stage: r for r in funnelq.q_curation_funnel(spark, SF_DIR).collect()}
    assert list(rows) == funnelq.STAGES
    seq = [rows[s] for s in funnelq.STAGES]
    for a, b in zip(seq, seq[1:]):
        assert a.n_docs >= b.n_docs and a.n_tokens >= b.n_tokens
    docs = load_table(spark, SF_DIR, "documents")
    n_orig = docs.count()
    n_copies = docs.where(SF.col("doc_id") % funnelq.EXACT_EVERY == 0).count()
    from data_pipeline_for_real_time_retail_analytics_spark.operators.textstats import (
        ws_tokens,
    )
    n_quotes = docs.where(
        (SF.col("doc_id") % funnelq.QUOTE_EVERY == 0)
        & (SF.size(ws_tokens(SF.col("text"))) >= funnelq.QUOTE_TOKENS)
    ).count()
    assert rows["raw"].n_docs == n_orig + n_copies + n_quotes
    assert rows["exact_dedup"].n_docs == rows["raw"].n_docs - n_copies, (
        "stage 1 must drop exactly the planted exact copies"
    )
    # quotes are exact-unique and quality-passing, so they can only die
    # at the chunk tier: span_clean drops AT LEAST all of them
    assert rows["quality"].n_docs - rows["span_clean"].n_docs >= n_quotes


def test_centroid_shift_closed_forms(spark):
    """Closed-form pins: a single-label corpus scores exactly 1.0; two
    equal-mass orthogonal labels each score 1/sqrt(2) against their
    union (0.707107 at 6 dp)."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import embdriftq
    import data_pipeline_for_real_time_retail_analytics_spark.plans.corpusbase as CB

    def run_on(embs):
        orig = CB.load_table
        try:
            CB.load_table = lambda spark, sf_dir, name: embs
            return {r.label: r.cos_to_global
                    for r in embdriftq.q_label_centroid_shift(
                        spark, "ignored").collect()}
        finally:
            CB.load_table = orig

    e1, e2 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
    one = spark.createDataFrame(
        [(i, e1, 0) for i in range(8)],
        "vec_id long, embedding array<float>, label int",
    )
    assert run_on(one) == {0: 1.0}
    two = spark.createDataFrame(
        [(i, e1, 0) for i in range(8)]
        + [(100 + i, e2, 1) for i in range(8)],
        "vec_id long, embedding array<float>, label int",
    )
    got = run_on(two)
    assert got == {0: 0.707107, 1: 0.707107}


def test_centroid_shift_bounds_and_global_linearity(spark):
    """On real data every cosine sits in [-1, 1]; and the global
    direction really is the sum of the label sums (recomputed
    independently from the raw table)."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import embdriftq
    from data_pipeline_for_real_time_retail_analytics_spark.plans.corpusbase import (
        _embs,
    )

    rows = embdriftq.q_label_centroid_shift(spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(-1.0 <= r.cos_to_global <= 1.0 for r in rows)
    # independent global: micro-quantized per-component sum over ALL rows
    direct = (
        _embs(spark, SF_DIR)
        .select(F.posexplode("embedding").alias("dim", "val"))
        .select("dim", F.round(F.col("val").cast("double") * 1_000_000, 0)
                .cast("long").alias("v"))
        .groupBy("dim").agg(F.sum("v").alias("g"))
    )
    via_labels = (
        _embs(spark, SF_DIR)
        .select("label", F.posexplode("embedding").alias("dim", "val"))
        .select("label", "dim",
                F.round(F.col("val").cast("double") * 1_000_000, 0)
                .cast("long").alias("v"))
        .groupBy("label", "dim").agg(F.sum("v").alias("c"))
        .groupBy("dim").agg(F.sum("c").alias("g"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_labels.collect())
    )


def test_cluster_size_histogram_matches_cluster_table(spark):
    """The histogram is EXACTLY the size distribution of the registered
    dedup_clusters output (independent recomputation), every cluster
    has >= 2 members, and sizes x counts account for every clustered
    doc."""
    from collections import Counter

    from data_pipeline_for_real_time_retail_analytics_spark.plans import (
        clusterstatq,
        llm as L,
    )

    hist = {r.cluster_size: r.n_clusters
            for r in clusterstatq.q_dup_cluster_sizes(spark, SF_DIR).collect()}
    clusters = L.q_dedup_clusters(spark, SF_DIR).collect()
    want = Counter(Counter(r.cluster_id for r in clusters).values())
    assert hist == dict(want)
    assert min(hist) >= 2, "a 1-member group is not a duplicate cluster"
    assert sum(s * n for s, n in hist.items()) == len(clusters)


def test_lang_quota_laws(spark):
    """Selection fills min(target, available); the head language's
    share of the kept corpus is strictly below its corpus share
    (temperature flattening) and the rarest language's is at or above
    (upweighting) — the mT5 rebalancing direction, on real output."""
    rows = langquotaq.q_lang_quality_mix(spark, SF_DIR).collect()
    assert rows
    n_total = sum(r.n_docs for r in rows)
    keep_total = sum(r.n_target for r in rows)
    assert keep_total <= (2 * n_total) // 5, "quota exceeds the 40% budget"
    for r in rows:
        assert r.n_selected == min(r.n_target, r.n_docs)
        assert r.sum_qkey_selected > 0 or r.n_selected == 0
    head = max(rows, key=lambda r: r.n_docs)
    rare = min(rows, key=lambda r: r.n_docs)
    assert head.n_target * n_total < head.n_docs * keep_total, (
        "head language not flattened"
    )
    assert rare.n_target * n_total >= rare.n_docs * keep_total, (
        "rare language not upweighted"
    )


# ---------- phrase search ----------


def test_phrase_three_term_chain_and_overlaps(spark):
    """The ≥3-term join chain on a hand-built corpus: a doc with two
    non-overlapping occurrences counts 2; a self-overlapping phrase
    counts every start position; a doc with the words present but not
    adjacent counts 0 (absent from output)."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.phrase import (
        phrase_match_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "x a b c y a b c z"),     # two clean occurrences
            (2, "a b c"),                  # exactly one
            (3, "a x b y c"),              # words present, not adjacent
            (4, "a a a a"),                # self-overlap: 'a a a' at 0 and 1
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_hits
        for r in phrase_match_counts(docs, ["a", "b", "c"]).collect()
    }
    assert got == {1: 2, 2: 1}
    over = {
        r.doc_id: r.n_hits
        for r in phrase_match_counts(docs, ["a", "a", "a"]).collect()
    }
    assert over[4] == 2, "overlapping starts each count (positions 0 and 1)"


def test_phrase_matches_a_text_scan_ground_truth(spark):
    """The index answer equals a brute-force text scan of the corpus —
    independent recomputation, no SQL in common."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import phraseq
    from data_pipeline_for_real_time_retail_analytics_spark.sources import (
        load_table,
    )

    got = {
        r.doc_id: r.n_hits
        for r in phraseq.q_phrase_search(spark, SF_DIR).collect()
    }
    needle = phraseq.PHRASE
    want = {}
    for r in load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect():
        toks = r.text.split()
        n = sum(
            1
            for i in range(len(toks) - len(needle) + 1)
            if toks[i : i + len(needle)] == needle
        )
        if n:
            want[r.doc_id] = n
    assert got == want


# ---------- length buckets ----------


def test_length_bucket_laws(spark):
    """Per-bucket accounting laws on real data: waste = padded − real,
    0 ≤ waste < padded (no doc overflows its cap at test scale), and
    bucketing strictly beats global-max padding wherever lengths are
    mixed."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import lenbucketq

    rows = lenbucketq.q_length_bucket_stats(spark, SF_DIR).collect()
    assert rows
    total_docs = sum(r.n_docs for r in rows)
    assert total_docs == 500 or total_docs > 0
    for r in rows:
        assert r.waste_tokens == r.padded_tokens - r.sum_tokens
        assert 0 <= r.waste_tokens < r.padded_tokens
        assert r.padded_tokens <= r.naive_padded_tokens
    assert sum(r.padded_tokens for r in rows) < sum(
        r.naive_padded_tokens for r in rows
    ), "bucketing shows no win over global-max padding?"


def test_length_bucket_caps_are_the_declared_ladder(spark):
    from data_pipeline_for_real_time_retail_analytics_spark.plans import lenbucketq

    rows = lenbucketq.q_length_bucket_stats(spark, SF_DIR).collect()
    assert all(r.bucket_cap in lenbucketq.BUCKET_CAPS for r in rows)


def test_lang_quota_selects_the_top_quality_docs(spark):
    """The selected set is exactly the top-n_target by (q_key desc,
    doc_id): recompute one language's selection independently."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans.corpusbase import (
        _docs,
    )

    summary = {
        r.lang: r for r in langquotaq.q_lang_quality_mix(spark, SF_DIR).collect()
    }
    lang = sorted(summary)[0]
    docs = _docs(spark, SF_DIR).where(F.col("lang") == lang)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    scored = docs.select(
        "doc_id",
        (
            F.size(F.array_distinct(toks)).cast("long") * F.lit(100_000)
            + F.size(toks).cast("long")
        ).alias("q_key"),
    ).collect()
    top = sorted(scored, key=lambda r: (-r.q_key, r.doc_id))
    want = top[: summary[lang].n_target]
    assert summary[lang].n_selected == len(want)
    assert summary[lang].sum_qkey_selected == sum(r.q_key for r in want)


def test_stream_drift_identical_under_rocksdb_state_store(spark):
    """The r9 RocksDB discipline extended to the new streaming pair:
    the drift counts' streaming state under the production RocksDB
    provider must produce the identical PSI table as the batch twin
    (provider binds at stream start — flip the conf around the
    drive)."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import (
        driftq,
        streamdriftq,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, rocks)
    try:
        out = streamdriftq.q_stream_events_value_drift(spark, SF_DIR).toPandas()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    batch = driftq.QUERIES["events_value_drift"](spark, SF_DIR).toPandas()
    assert out.to_dict("records") == batch.to_dict("records")

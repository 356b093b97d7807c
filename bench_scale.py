#!/usr/bin/env python
"""Order-of-magnitude scale spot-check (round-5 plan item).

Generates a deterministic ~``SCALE``× copy of the two tables the heavy
operators consume (``documents``, ``events``) from $SPARK_GRAFT_SF_DIR
(default sf0.1), then times the most expensive queries at base and
scaled size. The point is empirical evidence for the plan-shape
arguments: candidate-bounded dedup tiers and bounded-state streaming
should scale ~linearly in input size, never super-linearly.

Copy k of a document tags EVERY token with ``c<k>`` (plus an id
offset), so copies share no word shingles at n ≥ 2 — a mere text
prefix would leave all but the first n-1 shingles identical across
copies, making every document a high-Jaccard near-dup of its 9+
siblings and growing the TRUE pair count quadratically in the scale
factor (measured: 38× wall at 30× input before this fix). With
per-token tagging the near-dup structure (planted mutants per copy)
scales linearly, matching how a real corpus grows. Events keep their
timestamp range (10× rows per window — how event volume actually
grows) with per-copy user/event id offsets.

Usage: python bench_scale.py [--scale N]   (writes one JSON line)
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: the five most expensive registry queries (round-4 bench) + the exact
#: ones whose 100 TB claims lean on candidate-bounded plan shapes
HEAVY = [
    "minhash_lsh_dupes",
    "dedup_clusters",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "stream_events_hourly",
    # round-5 additions whose scale claims deserve the same evidence:
    # the two-pass gram aggregation and the stream-stream join state
    "boilerplate_ngrams",
    "stream_click_purchases",
    # this session's bigram LM: two corpus explodes + vocabulary-keyed
    # joins — the term-skew shape the 100 TB argument must survive
    "lm_perplexity",
    # r5 batch-3 additions with a genuine scale question: the per-order
    # self-join (bounded-basket claim), the events-wide cohort grid, and
    # the two corpus-composition passes
    "basket_pairs",
    "cohort_retention",
    "dup_rate_by_source",
    "quality_quota_prune",
    # the incremental daily-ingest dedup shape (r6 verdict ask #7 names
    # it one of the three heaviest families to scale-prove)
    "incremental_dedup_new_docs",
    # r7-staged pairs (plans/pending_r8.py): the two-phase outer-join
    # streaming drive's state/flush behavior and the applyInPandas
    # per-key interpolation (group count grows, group size constant)
    "stream_click_purchases_outer",
    "user_value_interpolation",
    # r7-staged boilerplate-span removal: two exploded-corpus passes +
    # a position-keyed anti-join — the gram-skew shape at corpus scale
    "boilerplate_removed_docs",
    # r7-staged CCNet bucketing: the lm_perplexity shape plus one rank
    # window per language partition
    "ccnet_buckets",
    # r7-staged DSIR selection: one featurize explode + broadcast
    # weight-table scoring + a doc-grain top-K rank
    "dsir_selected",
    # staged for r9 registration (plans/pending_r9.py): the KMV sketch's salted
    # bottom-k (distinct-vocabulary-bounded), the df-capped containment
    # self-join (the Σ df² bound under test), the cluster-keyed split
    # (pair graph + corpus-wide left join), the zone-map staging
    # write + metadata prune (orders-based), and blocked fuzzy matching
    # under the linear regime (block COUNT grows, sizes constant —
    # see the per-copy nation offset in build_scaled_dir)
    "kmv_distinct_tokens",
    "containment_dup_pairs",
    "cluster_safe_splits",
    "zonemap_pruned_orders",
    "fuzzy_customer_pairs",
    # staged for r9 registration (plans/pending_r9.py), second batch:
    # integer PageRank (edge count saturates as the
    # fixed catalog densifies under order growth), the per-user lag
    # window, and the key-grain skew profile
    "part_pagerank",
    "event_transitions",
    "join_key_skew",
    # staged for r10 registration (plans/pending_r10.py): the weighted
    # PageRank (same pair join as the unweighted form + a weight
    # aggregation), the one-pass sketch-vs-exact profile, and the
    # double-window sessionization + attribution rollup
    "part_pagerank_weighted",
    "approx_profile_orders",
    "session_first_touch",
    # staged for r10 registration, second batch: chunk-grain exact
    # dedup (duplication-bounded hash window) and the mergeable HLL
    # union rollup
    "chunk_dedup_docs",
    "sketch_rollup_events",
    "dedup_eval_metrics",
    "copurchase_triangles",
    # staged for r10 registration, third batch: the streaming
    # session_window attribution (two-window batch twin runs above via
    # session_first_touch; this one is a real AvailableNow drive)
    "stream_session_first_touch",
    # staged for r10 registration, fourth batch: the CMS build's
    # vocabulary-keyed count pass + bounded-cell broadcast estimate,
    # and the two one-pass PSI drift profiles (bins × groups state)
    "cms_heavy_tokens",
    "cms_merged_heavy_tokens",
    "events_value_drift",
    "events_value_ks",
    "events_daily_drift",
    "source_length_drift",
    # the Hilbert transform is map-side bit arithmetic; the locality
    # walk's 32 (curve, block) windows are the part worth scale-proving
    "hilbert_values",
    "curve_locality",
    # streaming sketch maintenance: a real AvailableNow drive whose
    # entire state is the 1536-cell matrix — the drive cost should be
    # flat-ish in state and linear in input
    "stream_cms_heavy_tokens",
    # hard_negatives is embedding-based: its scale evidence lives in
    # bench_hardneg_scale.py (the scaled-dir here carries no embeddings)
    # PMI: the lm_perplexity corpus pass + vocabulary-keyed marginal
    # joins — vocabulary grows with this harness's tagged copies, the
    # adversarial case for the count-table checkpoint
    "pmi_collocations",
    # staged for r11 registration (plans/pending_r11.py): the as-of
    # merge sweep (one user_id shuffle + per-key ordered window), the
    # Bloom-prefiltered chunk audit (corpus chunk pass + bounded-bit
    # broadcast probe), and the temperature-quota composition (per-row
    # scoring + one lang-partitioned rank window)
    "purchase_click_asof",
    "bloom_chunk_prefilter",
    "lang_quality_mix",
    # r11 second batch: positional-index phrase intersection (posting-
    # list-bounded joins) and the one-pass length-bucket audit
    "phrase_search",
    "length_bucket_stats",
    # streaming drift maintenance: bounded groups x bins x 2 state, an
    # AvailableNow drive whose cost should be linear in input rows
    "stream_events_value_drift",
    # the four-stage funnel composition: one scoring pass + two hash
    # tiers — the end-to-end shape whose cost should track the heaviest
    # single tier, not the sum of four corpus scans
    "curation_funnel",
    # cluster-size histogram: two tiny aggregations over the shared
    # pair components — cost tracks the pair materialization
    "dup_cluster_sizes",
    # r11 third batch: MAD outlier gate (three ≤ n_types-row partial
    # aggregations over events), the Jaccard-bin histogram (one tiny
    # aggregation past the shared pair set), priority sampling (one
    # scan + TakeOrderedAndProject head), and the cross-source 8-gram
    # matrix (distinct posting pass + map-side pair expansion from the
    # cap-bounded posting arrays — no gram-keyed join by design; copies
    # replicate the 20-source overlap structure linearly)
    "robust_outlier_events",
    "pair_jaccard_histogram",
    "priority_sample_docs",
    "source_overlap_matrix",
    # streaming KMV: per-source bottom-k state (≤ 20 × 256 BIGINTs) —
    # the AvailableNow drive should be input-linear with fixed startup
    # cost, like the other bounded-state streaming pairs
    "stream_kmv_distinct_bigrams",
    # r11 fourth batch: the binned interval join (per-copy user offsets
    # keep per-user temporal density constant, so candidates AND answer
    # grow linearly — the deployment shape), BPE pair mining (one corpus
    # token pass into a vocab-bounded aggregate; the tagged-copy vocab
    # growth is the documented Heaps-law adversarial case), and the OLS
    # trend (orders scan into a segments × days frame of constant size)
    "click_error_interval",
    "bpe_merge_candidates",
    "revenue_trend_by_segment",
    # r11 fifth batch: first-touch audience split (two user-keyed
    # passes over distinct user-days) and the CUSUM changepoint scan
    # (one events pass into a types × calendar-days window frame —
    # state bounded by time, not volume)
    "daily_new_vs_returning",
    "event_count_cusum",
]

#: id offset per generated copy. Must satisfy
#: scale * COPY_OFFSET + max(doc_id) < plant_near_dups' 10M ID_OFFSET or
#: copy ids collide with planted-mutant ids and silently corrupt the
#: dedup workload being timed — validated in main().
COPY_OFFSET = 100_000
MAX_SCALE = 90


def build_scaled_dir(spark: SparkSession, out_dir: str, scale: int) -> None:
    from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

    os.makedirs(out_dir, exist_ok=True)

    # Guard EVERY per-copy id offset, not just the documented doc_id one:
    # a base dir whose max id reaches the next copy's offset silently
    # merges copies (baskets/users collide) and corrupts the ratios
    # being measured, with no error.
    limits = {
        ("documents", "doc_id"): COPY_OFFSET,
        ("events", "event_id"): COPY_OFFSET * 10,
        ("events", "user_id"): COPY_OFFSET,
        ("lineitem", "l_orderkey"): COPY_OFFSET * 100,
        ("customer", "c_custkey"): COPY_OFFSET,
        ("orders", "o_orderkey"): COPY_OFFSET * 100,
    }
    for (table, col), per_copy in limits.items():
        mx = load_table(spark, SF_DIR, table).agg(F.max(col)).first()[0]
        if mx >= per_copy:
            raise SystemExit(
                f"base {table}.{col} max {mx} >= per-copy offset {per_copy}: "
                "copies would collide — raise COPY_OFFSET for this base dir"
            )

    docs = load_table(spark, SF_DIR, "documents")
    scaled_docs = None
    for k in range(scale):
        c = docs
        if k:
            c = c.select(
                (F.col("doc_id") + k * COPY_OFFSET).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.trim(F.col("text")), r"\s+"),
                        lambda w: F.concat(F.lit(f"c{k}"), w),
                    ),
                ).alias("text"),
                "lang",
                "source",
                # n_chars approximate for copies; the heavy queries read text only
                "n_chars",
            )
        scaled_docs = c if scaled_docs is None else scaled_docs.unionByName(c)
    scaled_docs.coalesce(8).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    events = load_table(spark, SF_DIR, "events")
    scaled_events = None
    for k in range(scale):
        c = events
        if k:
            c = c.select(
                (F.col("event_id") + k * COPY_OFFSET * 10).alias("event_id"),
                "ts",
                (F.col("user_id") + k * COPY_OFFSET).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        scaled_events = c if scaled_events is None else scaled_events.unionByName(c)
    scaled_events.coalesce(16).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )

    # lineitem for basket_pairs: copies offset the ORDER key only, so
    # each copy contributes its own baskets (pair supports scale
    # linearly with order count — exactly how order volume grows) while
    # the part assortment stays fixed, as a real catalog would.
    lineitem = load_table(spark, SF_DIR, "lineitem")
    scaled_li = None
    for k in range(scale):
        c = lineitem
        if k:
            c = c.withColumn(
                "l_orderkey", F.col("l_orderkey") + k * COPY_OFFSET * 100
            )
        scaled_li = c if scaled_li is None else scaled_li.unionByName(c)
    scaled_li.coalesce(16).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )

    # customer for fuzzy_customer_pairs: each copy keeps its names but
    # moves to its OWN nation-key range (offset 25·k), so block COUNT
    # grows with scale while block SIZES stay constant — the linear
    # regime a well-chosen blocking key maintains as an entity corpus
    # grows (a shared-nation scale-up instead grows every block ×scale
    # and the quadratic guard trips BY DESIGN; the lever there is a
    # finer key, not a bigger cluster — operators/fuzzy.py docstring).
    customer = load_table(spark, SF_DIR, "customer")
    scaled_cust = None
    for k in range(scale):
        c = customer
        if k:
            c = c.select(
                (F.col("c_custkey") + k * COPY_OFFSET).alias("c_custkey"),
                "c_name",
                (F.col("c_nationkey") + k * 25).alias("c_nationkey"),
                "c_acctbal",
                "c_mktsegment",
            )
        scaled_cust = c if scaled_cust is None else scaled_cust.unionByName(c)
    scaled_cust.coalesce(8).write.mode("overwrite").parquet(
        f"{out_dir}/customer.parquet"
    )

    # orders for zonemap_pruned_orders: per-copy order-key offset,
    # dates kept — order volume per window grows ×scale, the zone-map
    # prune keeps selecting the same date slice of a ×scale table.
    orders = load_table(spark, SF_DIR, "orders")
    scaled_ord = None
    for k in range(scale):
        c = orders
        if k:
            c = c.select(
                (F.col("o_orderkey") + k * COPY_OFFSET * 100).alias("o_orderkey"),
                (F.col("o_custkey") + k * COPY_OFFSET).alias("o_custkey"),
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            )
        scaled_ord = c if scaled_ord is None else scaled_ord.unionByName(c)
    scaled_ord.coalesce(16).write.mode("overwrite").parquet(
        f"{out_dir}/orders.parquet"
    )


def time_queries(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    out: dict[str, float] = {}
    queries = dict(entrymod.queries())
    # staged-but-unregistered pairs are timeable too
    from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r8 import (
        PENDING_QUERIES as _PENDING,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r9 import (
        PENDING_QUERIES as _PENDING9,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r10 import (
        PENDING_QUERIES as _PENDING10,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r11 import (
        PENDING_QUERIES as _PENDING11,
    )
    for _n, _fn in {**_PENDING, **_PENDING9, **_PENDING10, **_PENDING11}.items():
        queries.setdefault(_n, _fn)
    for name in HEAVY:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
        gc.collect()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the heavy list (default: all) — "
        "keeps very large --scale runs bounded to the families under test",
    )
    ap.add_argument(
        "--keep-scaled-dir",
        action="store_true",
        help="leave /tmp/spark_graft_scale_<N>x in place so follow-up "
        "probes (bench_kmv_shards.py) can reuse the build",
    )
    args = ap.parse_args()
    if args.queries:
        subset = args.queries.split(",")
        unknown = [q for q in subset if q not in HEAVY]
        if unknown:
            ap.error(f"unknown queries {unknown}; choose from {HEAVY}")
        HEAVY[:] = subset
    if not 2 <= args.scale <= MAX_SCALE:
        ap.error(
            f"--scale must be in [2, {MAX_SCALE}]: above that, copy ids "
            "reach plant_near_dups' 10M planting offset and collide"
        )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_scale")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.cleaner.periodicGC.interval", "45s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same untimed warmup as bench.py — without it the FIRST streaming
    # query (base stream_events_hourly) absorbs ~2 s of one-time engine
    # init the scaled run doesn't pay, deflating every scaled/base ratio
    import bench as _bench

    _bench._warmup(spark)

    scaled_dir = f"/tmp/spark_graft_scale_{args.scale}x"
    build_scaled_dir(spark, scaled_dir, args.scale)

    base = time_queries(spark, SF_DIR)
    scaled = time_queries(spark, scaled_dir)
    ratios = {
        n: round(scaled[n] / base[n], 2) if base[n] > 0 else -1.0 for n in HEAVY
    }
    print(
        json.dumps(
            {
                "scale": args.scale,
                "base_sec": base,
                "scaled_sec": scaled,
                "ratio": ratios,
                "base_dir": SF_DIR,
            }
        )
    )
    if not args.keep_scaled_dir:
        shutil.rmtree(scaled_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Corpus monitoring walk: the observability pass a training-data
pipeline runs on every ingest batch BEFORE the expensive curation
stages touch it — catch a drifted or degenerate batch at the sketch
tier, where every statistic is one bounded-state pass.

Composed from the engine's monitoring parts:

1. distribution drift — PSI per event type (diffuse reshaping) and the
   two-sample KS distance (single worst CDF gap) over fixed bins
   (plans/driftq.py); per-source document-length drift against the
   corpus reference — the mixture-audit signal;
2. frequency sketch — count-min heavy hitters over the token stream
   with exact counts alongside (plans/cmsq.py): a sudden new heavy
   token is boilerplate/spam arriving;
3. cardinality sketch — per-source KMV vocabulary estimates
   (plans/kmvq.py): a collapsing vocabulary estimate is template text
   flooding a source;
4. point anomalies — median/MAD robust outlier rates per event type
   (plans/outlierq.py): the fat-finger/unit-bug gate whose baseline
   outliers cannot corrupt (a z-score gate's can);
5. duplication profile — the Jaccard-bin histogram of verified
   near-dup pairs (plans/pairsimq.py) next to the cluster-size
   histogram: piled-at-the-threshold mass means the dedup cut is
   shaving a continuum, a giant cluster means template flooding;
6. syndication — the cross-source shared-8-gram matrix
   (plans/crossdupq.py): a source pair whose overlap rate sits far
   above the corpus background is a mirror/wire relationship to
   down-weight before training-mix math trusts the two as
   independent;
7. level shifts — the CUSUM changepoint scan over densified daily
   event counts (plans/cusumq.py): the fast detector for sustained
   volume drops/floods (an outage's zero-count days enter the series
   as real zeros);
8. business-metric trend — the exact-OLS revenue slope per segment
   (plans/trendq.py) next to the audience first-touch split
   (plans/audienceq.py): whether the level is drifting, and whether
   today's traffic is acquisition or retention.

The sketch tiers are mergeable (cells add, bottom-k unions, counts
add), so per-day/per-source sketches roll up to any reporting grain
without re-touching data — the property that makes this pass viable
at 100 TB; the dedup-profile tiers ride the pair materialization the
curation stages compute anyway.

Run:  python examples/corpus_monitoring_example.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from data_pipeline_for_real_time_retail_analytics_spark.plans import (  # noqa: E402
    audienceq,
    cmsq,
    crossdupq,
    cusumq,
    driftq,
    kmvq,
    outlierq,
    pairsimq,
    trendq,
)

#: PSI rules of thumb in micro-units
PSI_STABLE, PSI_SHIFTED = 100_000, 250_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("corpus_monitoring_example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("== event-stream drift (window B vs window A) ==")
    psi = {r.event_type: r for r in
           driftq.q_events_value_drift(spark, sf_dir).collect()}
    ks = {r.event_type: r for r in
          driftq.q_events_value_ks(spark, sf_dir).collect()}
    for et in sorted(psi):
        p, k = psi[et], ks[et]
        flag = ("SHIFTED" if p.psi_micro > PSI_SHIFTED
                else "watch" if p.psi_micro > PSI_STABLE else "stable")
        print(f"  {et:10s} psi={p.psi_micro:>8d}µ ks={k.ks_ppm:>7d}ppm "
              f"(n={p.n_ref}/{p.n_cur}) -> {flag}")

    print("\n== per-source length-profile drift vs corpus ==")
    worst = sorted(
        driftq.q_source_length_drift(spark, sf_dir).collect(),
        key=lambda r: -r.psi_micro,
    )[:5]
    for r in worst:
        print(f"  {r.source:8s} psi={r.psi_micro:>8d}µ (n={r.n_cur})")

    print("\n== CMS heavy tokens (sample candidates, full-stream sketch) ==")
    for r in cmsq.q_cms_heavy_tokens(spark, sf_dir).collect()[:8]:
        print(f"  {r.token:12s} est={r.est_count:>6d} exact={r.exact_count:>6d} "
              f"overcount={r.overcount}")

    print("\n== KMV vocabulary estimates per source (first 5) ==")
    for r in kmvq.q_kmv_distinct_tokens(spark, sf_dir).collect()[:5]:
        print(f"  {r.source:8s} est={r.est_distinct:>6d} "
              f"exact={r.exact_distinct:>6d}")

    print("\n== robust outlier rates (median/MAD, 3-MAD gate) ==")
    for r in outlierq.q_robust_outlier_events(spark, sf_dir).collect():
        print(f"  {r.event_type:10s} median={r.median_value:>7.2f} "
              f"mad={r.mad:>6.2f} outliers={r.n_outliers:>5d} "
              f"({r.outlier_ppm}ppm of {r.n_values})")

    print("\n== near-dup similarity profile (Jaccard bins) ==")
    for r in pairsimq.q_pair_jaccard_histogram(spark, sf_dir).collect():
        print(f"  [{r.bin_lo:.2f}, {r.bin_lo + 0.05:.2f}) "
              f"pairs={r.n_pairs:>5d} "
              f"range={r.min_jaccard:.4f}..{r.max_jaccard:.4f}")

    print("\n== top cross-source 8-gram overlaps (syndication watch) ==")
    top = sorted(
        crossdupq.q_source_overlap_matrix(spark, sf_dir).collect(),
        key=lambda r: -r.overlap_ppm,
    )[:5]
    for r in top:
        print(f"  {r.source_a:8s} ~ {r.source_b:8s} "
              f"shared={r.shared_grams:>4d} rate={r.overlap_ppm}ppm")

    print("\n== CUSUM changepoint scan (daily volumes, h = k) ==")
    for r in cusumq.q_event_count_cusum(spark, sf_dir).collect():
        alarm = (f"ALARM from {r.first_alarm_day} ({r.n_alarm_days}d)"
                 if r.n_alarm_days else "quiet")
        print(f"  {r.event_type:10s} k={r.slack_k:>4d} "
              f"max_cusum={r.max_cusum:>5d} -> {alarm}")

    print("\n== revenue trend by segment (exact OLS, cents/day) ==")
    for r in trendq.q_revenue_trend_by_segment(spark, sf_dir).collect():
        seg = r.c_mktsegment if r.c_mktsegment is not None else "(null)"
        slope = (f"{r.slope_cents_per_day:>10.2f}"
                 if r.slope_cents_per_day is not None else "   (1 day)")
        print(f"  {seg:10s} days={r.n_days:>5d} slope={slope}")

    print("\n== audience first-touch split (first 5 days) ==")
    for r in audienceq.q_daily_new_vs_returning(spark, sf_dir).collect()[:5]:
        print(f"  {r.day} active={r.n_active_users:>4d} "
              f"new={r.n_new_users:>4d} returning={r.n_returning_users:>4d}")

    spark.stop()


if __name__ == "__main__":
    main()

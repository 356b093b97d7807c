#!/usr/bin/env python
"""Hot-key skew probe for the per-user-window family — the one
robustness axis the empty/NULL/scale sweeps don't cover: a per-user
window (sessionization, journey transitions) partitions its state BY
USER, so a hot key concentrates that user's whole history in one task.
This probe measures how bad that actually is.

Two synthetic event tables of identical size (~1M rows, deterministic
spark.range generation): UNIFORM (10k users, ~100 events each) and HOT
(one user holds 30% of all events, rest uniform). Timed on each:
`session_first_touch` (two per-user windows + rollup),
`event_transitions` (per-user lag window + pair aggregation), and the
r11-staged `purchase_click_asof` (union-tag as-of merge sweep — one
per-user ordered window), via the registered plan functions (loader
monkeypatched — the test suite's idiom).

Expected shape and why: per-user window cost is O(per-user rows ×
log(per-user rows)) in the sort feeding the window, so a 300k-row hot
user is one task doing ~30% of the total sort work — a straggler
bounded by the hot key's OWN volume, not a blow-up (no quadratic
term). The probe prints the measured hot/uniform wall ratio; ~1-2×
means the bound holds, and the mitigation at 100 TB is upstream
anyway (the join_key_skew diagnostic flags such keys for per-key
sub-bucketing, e.g. sessionizing a bot user by day first).

Usage: python bench_skew_probe.py [--rows 1000000] [--hot-share 0.3]
Writes one JSON line: {"probe": "hot_key_skew", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def make_events(spark, n_rows: int, hot_share: float):
    """Deterministic synthetic events: ts strides 5s over Jan 2024,
    event types cycle, values cycle; user assignment differs only in
    the hot fraction."""
    base = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=(F.col("id") % 500_000) * 5)
        ).alias("ts"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("view", "click", "purchase", "signup", "error")]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("event_type"),
        ((F.col("id") % 9973).cast("double") / 20).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    hot_cut = int(n_rows * hot_share)
    uniform = base.withColumn("user_id", F.col("event_id") % 10_000)
    hot = base.withColumn(
        "user_id",
        F.when(F.col("event_id") < hot_cut, F.lit(0)).otherwise(
            F.col("event_id") % 10_000
        ),
    )
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    return uniform.select(cols), hot.select(cols)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--hot-share", type=float, default=0.3)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_skew_probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # 32 concurrent tasks sharing the default 1g local-mode heap
        # OOM on the hot-key interval join's ~9M-pair output; size the
        # probe JVM for the machine (the container has 128 GiB)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import data_pipeline_for_real_time_retail_analytics_spark.plans.asofq as AQ
    import data_pipeline_for_real_time_retail_analytics_spark.plans.markovq as MK
    import data_pipeline_for_real_time_retail_analytics_spark.plans.rangejoinq as RJ
    import data_pipeline_for_real_time_retail_analytics_spark.plans.sessionattrq as SA

    uniform, hot = make_events(spark, args.rows, args.hot_share)
    frames = {
        "uniform": uniform.localCheckpoint(),
        "hot": hot.localCheckpoint(),
    }
    queries = (
        ("session_first_touch", SA, SA.q_session_first_touch),
        ("event_transitions", MK, MK.QUERIES["event_transitions"]),
        # r11-staged as-of merge sweep: same per-user window shape, so
        # the same bounded-straggler argument must hold under a bot key
        ("purchase_click_asof", AQ, AQ.q_purchase_click_asof),
        # r11-staged binned interval join: a hot user grows the TRUE
        # answer quadratically in its density (every in-window
        # click×error pair is output), so walls are read NEXT TO the
        # output-row counts below — the operator claim is only that
        # cost tracks the hot key's own candidate volume, with bin
        # width as the documented lever
        ("click_error_interval", RJ, RJ.q_click_error_interval),
    )

    def run(label: str, qname: str) -> float:
        ev = frames[label]
        mod, fn = {q: (m, f) for q, m, f in queries}[qname]
        orig = mod.load_table
        try:
            mod.load_table = lambda spark, sf_dir, name: ev
            t0 = time.perf_counter()
            fn(spark, "ignored").write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        finally:
            mod.load_table = orig

    for ev in frames.values():
        ev.count()  # materialize outside the timed region
    # untimed warm-up pass (codegen + shuffle infra), then the timed
    # pass in alternating order so neither label absorbs one-time costs
    out: dict[str, dict[str, float]] = {"uniform": {}, "hot": {}}
    for qname, _m, _f in queries:
        for label in ("uniform", "hot"):
            run(label, qname)
        for label in ("hot", "uniform"):
            out[label][qname] = run(label, qname)
    ratios = {
        q: round(out["hot"][q] / out["uniform"][q], 2)
        for q in out["uniform"]
    }
    # untimed output-row counts: attribute wall growth to answer growth
    out_rows: dict[str, dict[str, int]] = {"uniform": {}, "hot": {}}
    for qname, mod, fn in queries:
        for label in ("uniform", "hot"):
            orig = mod.load_table
            try:
                mod.load_table = (
                    lambda spark, sf_dir, name, _ev=frames[label]: _ev
                )
                out_rows[label][qname] = fn(spark, "ignored").count()
            finally:
                mod.load_table = orig
    print(
        json.dumps(
            {
                "probe": "hot_key_skew",
                "rows": args.rows,
                "hot_share": args.hot_share,
                "wall_sec": out,
                "hot_over_uniform": ratios,
                "output_rows": out_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

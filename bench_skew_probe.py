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

A second, purpose-built section probes the r11-staged binned interval
join at EQUAL per-key temporal density with skewed key mass (the
window-family frames are the wrong substrate for a coincidence join —
see the inline comment): the design claim is that the (key, bin)
composite join key re-shards a hot key across its own time range, so
the hot/uniform wall ratio stays near 1 while outputs match.

Usage: python bench_skew_probe.py [--rows 1000000] [--hot-share 0.3]
Writes one JSON line: {"probe": "hot_key_skew", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from contextlib import contextmanager

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
    import data_pipeline_for_real_time_retail_analytics_spark.plans.sessionattrq as SA

    @contextmanager
    def patched_loader(mod, frame):
        orig = mod.load_table
        mod.load_table = lambda spark, sf_dir, name, _ev=frame: _ev
        try:
            yield
        finally:
            mod.load_table = orig

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
    )

    def run(label: str, qname: str) -> float:
        mod, fn = {q: (m, f) for q, m, f in queries}[qname]
        with patched_loader(mod, frames[label]):
            t0 = time.perf_counter()
            fn(spark, "ignored").write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)

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
    # ---- binned interval join: key skew at EQUAL per-key density ----
    # The window-family frames above are the wrong substrate for a
    # coincidence join (uniform users there have one event type and
    # ~14 h event spacing — an empty join by construction). The honest
    # experiment holds per-user temporal density CONSTANT and skews
    # only the key mass: uniform = n_rows/1000 users of 1000
    # consecutive 5 s-spaced events each; hot = one user absorbing the
    # first hot_share of rows at the SAME density. Binning composes the
    # join key as (user, 60 s-bin), so the hot user re-shards across
    # its own time range — the design claim this probe checks is ratio
    # ≈ answer ratio (no single-task pile-up on the hot key).
    from data_pipeline_for_real_time_retail_analytics_spark.operators.rangejoin import (
        interval_join_binned,
    )

    dense = spark.range(args.rows).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("id") * 5)
        ).alias("ts"),
        # plain id%5 typing is safe HERE because the user key is
        # div-based (id div 1000) — no mod-mod aliasing; every user
        # gets all five types and clicks sit 15 s from the next error
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("view", "click", "purchase", "signup", "error")]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("event_type"),
    )
    hot_cut = int(args.rows * args.hot_share)
    dense_frames = {
        "uniform": dense.withColumn(
            "user_id", (F.col("event_id") / 1000).cast("long")
        ).localCheckpoint(),
        "hot": dense.withColumn(
            "user_id",
            F.when(F.col("event_id") < hot_cut, F.lit(0)).otherwise(
                (F.col("event_id") / 1000).cast("long")
            ),
        ).localCheckpoint(),
    }

    def run_interval(label: str) -> tuple[float, int]:
        ev = dense_frames[label]
        clicks = ev.where(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        errors = ev.where(F.col("event_type") == "error").select(
            "user_id", F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"),
        )
        joined = interval_join_binned(
            clicks, errors, ["user_id"], "click_ts", "error_ts", 60,
            gap_col="gap_us",
        )
        t0 = time.perf_counter()
        joined.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        return wall, joined.count()

    interval_out: dict[str, dict[str, float]] = {}
    for label in ("uniform", "hot"):
        run_interval(label)  # warm-up
    for label in ("hot", "uniform"):
        wall, n_out = run_interval(label)
        interval_out[label] = {"wall_sec": wall, "output_rows": n_out}

    print(
        json.dumps(
            {
                "probe": "hot_key_skew",
                "rows": args.rows,
                "hot_share": args.hot_share,
                "wall_sec": out,
                "hot_over_uniform": ratios,
                "interval_join_equal_density": interval_out,
                "interval_hot_over_uniform": round(
                    interval_out["hot"]["wall_sec"]
                    / interval_out["uniform"]["wall_sec"],
                    2,
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

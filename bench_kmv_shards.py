#!/usr/bin/env python
"""Streaming-KMV state-sharding probe (r10 verdict ask #4).

The 90× stream_kmv point (478.5 s, per-unit 0.43) is volume through
the Arrow/Python custom-state path, and streaming/kmvstate.py names
sharding as the production lever. This probe demonstrates the knob by
timing the SKETCH-MAINTENANCE drive (the streaming part of the cell —
corpus staging and the batch-exact comparison column excluded) on the
90× corpus under three configurations:

* ``unsalted_p8`` — the registered cell's own drive shape
  (plans/streamq._drain pins 8 state partitions): 20 source groups
  hash onto 8 partitions, 2-3 groups per Python-worker task, serial
  within a task.
* ``unsalted_p32`` — more state partitions: groups spread across more
  tasks, but parallelism stays GROUP-BOUND (≤ 20 non-empty
  partitions no matter the count).
* ``salted_s<S>_p32`` — the composite-key form: state key =
  ``source # pmod(hash(h), S)`` gives 20·S groups, so state
  parallelism EXCEEDS the source count — the true production lever.
  EXACT by the bottom-k merge law (bottom_k(A ∪ B) =
  bottom_k(bottom_k(A) ∪ bottom_k(B))): the S shard sketches per
  source merge to the unsharded sketch, which the probe VERIFIES
  against the unsalted drive's final state before reporting walls.

Shuffle partitions bind a stream at start, so each drive sets the
count around its own ``run_available_now`` (the _drain discipline)
inside ONE session — no JVM restarts between points.

Run AFTER ``bench_scale.py --scale 90 --keep-scaled-dir`` (reuses the
kept dir; refuses to run without it). Writes one JSON line.

Usage: python bench_kmv_shards.py [--scale 90] [--salt 4]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _final_sketches(emissions, key_col: str) -> dict:
    """key -> sorted bottom-k hash list, from each key's LAST emission
    (max monotone update counter)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key_col)
    last = (
        emissions.withColumn("mx", F.max("upd").over(w))
        .where(F.col("upd") == F.col("mx"))
    )
    out: dict[str, list[int]] = {}
    for r in last.orderBy(key_col, "rank").collect():
        out.setdefault(r[key_col], []).append(r.h)
    return out


def _drive(spark, staged: str, partitions: int, salt: int | None, tag: str):
    """Time ONE sketch-maintenance drive at ``partitions`` state
    partitions; returns (wall_sec, final per-source sketches with
    salted shards merged via the bottom-k law)."""
    from pyspark.sql import functions as F

    from data_pipeline_for_real_time_retail_analytics_spark.plans.kmvq import K
    from data_pipeline_for_real_time_retail_analytics_spark.plans.streamcmsq import (
        DOCS_SCHEMA,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.streamkmvq import (
        _bigram_hashes,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.streaming.ingest import (
        file_stream,
        run_available_now,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.streaming.kmvstate import (
        kmv_sketch_stream,
    )

    name = f"kmv_shards_{tag}"
    spark.catalog.dropTempView(name)
    ckpt = tempfile.mkdtemp(prefix=f"{name}_ckpt_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    t0 = time.perf_counter()
    try:
        stream = file_stream(
            spark, staged, schema=DOCS_SCHEMA, max_files_per_trigger=1
        )
        hashed = _bigram_hashes(stream)
        if salt is None:
            keyed, key_col = hashed, "source"
        else:
            keyed = hashed.withColumn(
                "skey",
                F.concat(
                    F.col("source"),
                    F.lit("#"),
                    F.pmod(F.hash("h"), F.lit(salt)).cast("string"),
                ),
            )
            key_col = "skey"
        plan = kmv_sketch_stream(keyed, key_col=key_col, hash_col="h", k=K)
        # partitions bind at stream start — the _drain discipline,
        # with the count under test instead of the pinned 8
        spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
        q = run_available_now(plan, ckpt, queryName=name, output_mode="update")
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
    wall = round(time.perf_counter() - t0, 3)

    sketches = _final_sketches(spark.table(name), key_col)
    if salt is not None:
        # merge law: union the shard sketches, re-truncate to bottom-k
        merged: dict[str, set] = {}
        for key, hs in sketches.items():
            src = key.rsplit("#", 1)[0]
            merged.setdefault(src, set()).update(hs)
        sketches = {s: sorted(v)[:K] for s, v in merged.items()}
    return wall, sketches


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=90)
    ap.add_argument("--salt", type=int, default=4)
    args = ap.parse_args()
    scaled_dir = f"/tmp/spark_graft_scale_{args.scale}x"
    if not os.path.isdir(scaled_dir):
        raise SystemExit(
            f"{scaled_dir} missing — run bench_scale.py --scale "
            f"{args.scale} --keep-scaled-dir first"
        )

    from pyspark.sql import SparkSession

    from data_pipeline_for_real_time_retail_analytics_spark.plans.streamkmvq import (
        _N_STAGE_FILES,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_kmv_shards")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # stage once for all drives: same 3-file layout as the registered
    # cell (multi-batch AvailableNow at maxFilesPerTrigger=1)
    staged = tempfile.mkdtemp(prefix="kmv_shards_docs_")
    (
        load_table(spark, scaled_dir, "documents")
        .repartition(_N_STAGE_FILES)
        .write.mode("overwrite")
        .parquet(staged)
    )

    results: dict[str, float] = {}
    reference = None
    try:
        for label, parts, salt in (
            ("unsalted_p8", 8, None),
            ("unsalted_p32", 32, None),
            (f"salted_s{args.salt}_p32", 32, args.salt),
        ):
            wall, sketches = _drive(spark, staged, parts, salt, label)
            results[label] = wall
            if reference is None:
                reference = sketches
            else:
                assert sketches == reference, (
                    f"{label}: final sketches diverge from the reference "
                    "drive — the merge-law exactness claim is broken"
                )
            gc.collect()
    finally:
        shutil.rmtree(staged, ignore_errors=True)

    print(json.dumps({"scale": args.scale, "walls_sec": results}))
    spark.stop()


if __name__ == "__main__":
    main()

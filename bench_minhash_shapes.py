#!/usr/bin/env python
"""MinHash band-join shape experiment (round-6 plan item).

Compares the two candidate-generation shapes for MinHash-LSH near-dup
pairs, at 10x input and at a production-ish parameterization
(num_perm=64 / bands=16), measuring wall seconds AND shuffle-write
bytes (Spark UI REST API):

* ``carry``  — the shipped shape (`operators/dedup.py::minhash_lsh_pairs`):
  every banded row carries the document's full shingle array through the
  band equi-join, so the exact-Jaccard verify needs no second join; the
  self-join's two sides are the identical subtree, so ReuseExchange
  computes shingling+signatures once — but the shuffle ships
  ~bands x the corpus shingle volume.
* ``fetch``  — candidates-then-fetch: band-join on
  (doc_id, band_id, band_key) only (tiny rows), dedup candidate pairs,
  then LEFT-SEMI the raw docs down to surviving candidates and
  re-shingle ONLY those for the exact-Jaccard verify. Shuffles are
  id-sized; the price is a second (small) shingling pass plus two
  fetch joins.

Both produce identical pair sets (asserted). Run:

    python bench_minhash_shapes.py [--scale 10]

One JSON line per configuration.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def pairs_fetch(
    df: DataFrame,
    num_perm: int,
    bands: int,
    threshold: float,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidates-then-fetch variant of minhash_lsh_pairs (same output)."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.dedup import (
        _banded_signatures,
        with_shingles,
    )

    banded = _banded_signatures(df, num_perm, bands, n, text_col, id_col).select(
        id_col, "band_id", "band_key"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Survivor fetch: filter the RAW docs to candidate members first
    # (semi-join on the cheap id column), then shingle only those rows.
    surv_ids = (
        cand.select(F.col("doc_a").alias(id_col))
        .union(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sh = with_shingles(
        df.join(surv_ids, id_col, "leftsemi"), n, text_col, id_col
    ).select(id_col, "shingles", "n_shingles")
    sa = sh.alias("sa")
    sb = sh.alias("sb")
    fetched = (
        cand.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            F.col("sa.shingles").alias("sh_a"),
            F.col("sa.n_shingles").alias("n_a"),
            F.col("sb.shingles").alias("sh_b"),
            F.col("sb.n_shingles").alias("n_b"),
        )
    )
    n_common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = n_common / (F.col("n_a") + F.col("n_b") - n_common)
    return fetched.select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    ).where(F.round(jac, 4) >= threshold)


def shuffle_write_bytes(ui_port: int) -> int:
    """Sum shuffle-write bytes over all completed stages via the UI REST."""
    base = f"http://localhost:{ui_port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/stages?status=complete")
    )
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument(
        "--one",
        default=None,
        metavar="NUM_PERM,BANDS,SHAPE",
        help="measure exactly one (config, shape) in this process and exit "
        "— fresh-process protocol: within-session ordering (JIT/codegen "
        "warmup, page cache) otherwise skews whichever variant runs later",
    )
    ap.add_argument(
        "--no-broadcast",
        action="store_true",
        help="disable broadcast joins — the corpus-scale regime where the "
        "band join can only be a shuffle join; at local SF AQE otherwise "
        "broadcasts the banded side and the carry shape's bands-x-shingle "
        "exchange (the 100 TB question) never materializes",
    )
    args = ap.parse_args()

    ui_port = 4049
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bench_minhash_shapes")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(ui_port))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.cleaner.periodicGC.interval", "45s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if args.no_broadcast:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    from bench_scale import build_scaled_dir
    from data_pipeline_for_real_time_retail_analytics_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.llm import _docs

    scaled_dir = f"/tmp/spark_graft_mhshape_{args.scale}x"
    if not os.path.exists(f"{scaled_dir}/documents.parquet"):
        build_scaled_dir(spark, scaled_dir, args.scale)

    docs = _docs(spark, scaled_dir)

    if args.one:
        np_, b_, shape = args.one.split(",")
        configs = [{"num_perm": int(np_), "bands": int(b_), "threshold": 0.5}]
        shapes = [(shape, {"carry": minhash_lsh_pairs, "fetch": pairs_fetch}[shape])]
    else:
        configs = [
            # shipped default (the registry query's parameterization)
            {"num_perm": 12, "bands": 3, "threshold": 0.5},
            # production-ish: 64 perms, 16 bands of 4 rows — the
            # high-band regime where carry multiplies the shingle shuffle
            {"num_perm": 64, "bands": 16, "threshold": 0.5},
        ]
        shapes = [("carry", minhash_lsh_pairs), ("fetch", pairs_fetch)]

    for cfg in configs:
        for shape, fn in shapes:
            gc.collect()
            before = shuffle_write_bytes(ui_port)
            t0 = time.perf_counter()
            out = fn(docs, n=3, text_col="text", id_col="doc_id", **cfg)
            n_pairs = out.count()
            wall = round(time.perf_counter() - t0, 2)
            time.sleep(1.0)  # let the status store settle
            shuffled = shuffle_write_bytes(ui_port) - before
            print(
                json.dumps(
                    {
                        "scale": args.scale,
                        **cfg,
                        "shape": shape,
                        "no_broadcast": args.no_broadcast,
                        "wall_sec": wall,
                        "shuffle_mb": round(shuffled / 1e6, 1),
                        "pairs": n_pairs,
                    }
                )
            )

    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""BM25 scale spot-check.

The operator's claim (operators/bm25.py): the token explode is
map-side and the query-bag filter drops non-hits before any shuffle,
so total cost is one linear scan of corpus tokens plus shuffle work
bounded by HIT volume. This harness grows the corpus with
token-tagged copies (the bench_scale.py discipline — copy k's tokens
are prefixed `c<k>`, so the query bag keeps hitting ONLY the base
copy) and times ``bm25_scores`` at 1x/30x/90x: hits stay constant
while corpus tokens grow, so the wall should track the linear
map-side scan with no super-linear term — and the gap between wall
growth and corpus growth is exactly the hit-bounded shuffle saving.

Fresh-process protocol per scale + forced-GC medians, as
bench_zorder_scale.py (same host-noise rationale).

Usage: python bench_bm25_scale.py [--scales 1,30,90] [--reps 3]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from data_pipeline_for_real_time_retail_analytics_spark.operators.bm25 import (  # noqa: E402
    bm25_scores,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
QUERY_TERMS = ["dup", "spark", "window"]
COPY_OFFSET = 100_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,30,90")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--one", action="store_true")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    if not args.one:
        merged: dict[str, dict[str, float]] = {}
        for scale in scales:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one", "--scales", str(scale), "--reps", str(args.reps)],
                capture_output=True, text=True, check=True,
            )
            merged.update(json.loads(res.stdout.strip().splitlines()[-1])["scales"])
        print(json.dumps({"metric": "bm25_scale", "scales": merged}))
        return

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

    def settle() -> None:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)

    work = tempfile.mkdtemp(prefix="bm25_scale_")
    out: dict[str, dict[str, float]] = {}
    try:
        docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        for scale in scales:  # usually one (subprocess dispatch), but
            # honor every requested scale — silently measuring only
            # scales[0] would hand back a partial JSON that looks done
            parts = [docs]
            for k in range(1, scale):
                parts.append(
                    docs.select(
                        (F.col("doc_id") + k * COPY_OFFSET).alias("doc_id"),
                        F.concat_ws(
                            " ",
                            F.transform(
                                F.split(F.trim(F.col("text")), r"\s+"),
                                lambda w: F.concat(F.lit(f"c{k}"), w),
                            ),
                        ).alias("text"),
                    )
                )
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
            src = os.path.join(work, f"docs_{scale}")
            scaled.repartition(max(8, scale)).write.mode("overwrite").parquet(
                src
            )
            corpus = spark.read.parquet(src)
            n = corpus.count()

            walls: list[float] = []
            hits = None
            for _ in range(args.reps):
                settle()
                t0 = time.monotonic()
                result = bm25_scores(corpus, QUERY_TERMS)
                result.write.mode("overwrite").format("noop").save()
                walls.append(time.monotonic() - t0)
                if hits is None:
                    hits = result.count()
            out[str(scale)] = {
                "docs": n,
                "hit_docs": hits,
                "wall_sec": round(statistics.median(walls), 2),
                "samples": [round(v, 2) for v in walls],
            }
            shutil.rmtree(src, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"metric": "bm25_scale", "scales": out}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Z-order write-cost scale spot-check.

The operator's 100 TB claim (operators/zorder.py): because the Morton
code is a single transient long, OPTIMIZE ZORDER costs the same
one-sample-pass + one-range-shuffle write as single-key range
clustering — multi-dimensional locality is free at write time. This
harness measures both rewrites over the same scattered input at
1x/10x/30x a 1.5M-row base (two uniform integral dimensions, the
(customer, day) shape), printing one JSON line with per-scale walls
and the z/single ratio. Scaling the input ~linearly with near-1.0
ratios is the evidence; a growing ratio would mean the z computation
(or its broadcast stats join) has a hidden super-linear term.

Usage: python bench_zorder_scale.py [--scales 1,10,30] [--base 1500000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from data_pipeline_for_real_time_retail_analytics_spark.operators.zorder import (  # noqa: E402
    zorder_compact,
)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,30")
    ap.add_argument("--base", type=int, default=1_500_000)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="zorder_scale_")
    out: dict[str, dict[str, float]] = {}
    try:
        for scale in scales:
            n = args.base * scale
            src = os.path.join(work, f"src_{scale}")
            # uniform (x, y) grid, hash-scattered: the worst layout
            (
                spark.range(n)
                .select(
                    (F.col("id") % 4096).alias("x"),
                    ((F.col("id") * 2654435761) % 4096).alias("y"),
                    F.col("id").alias("payload"),
                )
                .repartition(64, "payload")
                .write.mode("overwrite")
                .parquet(src)
            )
            files = max(16, 16 * scale)

            t0 = time.monotonic()
            (
                spark.read.parquet(src)
                .repartitionByRange(files, "x")
                .sortWithinPartitions("x")
                .write.mode("overwrite")
                .parquet(os.path.join(work, f"by_x_{scale}"))
            )
            single = time.monotonic() - t0

            t0 = time.monotonic()
            zorder_compact(
                spark,
                src,
                os.path.join(work, f"by_z_{scale}"),
                ["x", "y"],
                bits=12,
                target_files=files,
            )
            zorder = time.monotonic() - t0

            out[str(scale)] = {
                "rows": n,
                "single_key_sec": round(single, 2),
                "zorder_sec": round(zorder, 2),
                "ratio": round(zorder / single, 2),
            }
            for d in (src, f"by_x_{scale}", f"by_z_{scale}"):
                shutil.rmtree(os.path.join(work, os.path.basename(d)),
                              ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"metric": "zorder_write_cost", "scales": out}))


if __name__ == "__main__":
    main()

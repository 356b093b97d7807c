#!/usr/bin/env python
"""Z-order write-cost scale spot-check.

The operator's 100 TB claim (operators/zorder.py): because the Morton
code is a single transient long, OPTIMIZE ZORDER is the same
one-sample-pass + one-range-shuffle write as single-key range
clustering, plus a bounded constant-factor overhead (one narrow
min/max stats scan, and the Morton projection evaluated in both the
sampling pass and the shuffle). This harness measures both rewrites
over the same scattered input at 1x/10x/30x a 1.5M-row base (two
INDEPENDENT uniform integral dimensions, the (customer, day) shape),
printing one JSON line with per-scale median walls and the z/single
ratio. A FLAT ratio across scales is the evidence — the overhead is a
constant factor, not a hidden super-linear term; a growing ratio
would indict the stats broadcast or the Morton expression.

Fresh-process protocol (same as bench_minhash_shapes.py): each scale
runs in its OWN subprocess. Within one session, a later scale times
the ContextCleaner/page-cache debt of every earlier one — measured
17.6 s vs 9.7 s for the identical 30x z-order write, even with the
bench.py gc.collect + periodicGC protocol applied — so cross-scale
curves from one session are not comparable.

Usage: python bench_zorder_scale.py [--scales 1,10,30] [--base 1500000]
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

from data_pipeline_for_real_time_retail_analytics_spark.operators.zorder import (  # noqa: E402
    zorder_compact,
)
from data_pipeline_for_real_time_retail_analytics_spark.sources.sink import (  # noqa: E402
    WarehouseSink,
)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
#: per-dimension grid size — x and y are INDEPENDENT coordinates
#: (row-major index split), so the Morton key genuinely mixes two
#: dimensions; 1024^2 cells are fully covered from ~1M rows up
GRID = 1024


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,30")
    ap.add_argument("--base", type=int, default=1_500_000)
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions per write variant; the cell "
                    "reports the MEDIAN (GC noise swings single runs 2-6x)")
    ap.add_argument(
        "--one",
        action="store_true",
        help="measure the (single) requested scale in THIS process; "
        "without it, each scale is dispatched to its own subprocess "
        "(fresh-process protocol — see module docstring)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    if not args.one:
        merged: dict[str, dict[str, float]] = {}
        for scale in scales:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one", "--scales", str(scale), "--base", str(args.base),
                 "--reps", str(args.reps)],
                capture_output=True, text=True, check=True,
            )
            line = res.stdout.strip().splitlines()[-1]
            merged.update(json.loads(line)["scales"])
        print(json.dumps({"metric": "zorder_write_cost", "scales": merged}))
        return

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        # NO periodicGC override here: a forced full System.gc() landing
        # inside the timed z write skewed the 30x cell 2-8x (measured).
        # Isolation comes from the fresh process per scale instead.
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def settle() -> None:
        """Force a full JVM GC OUTSIDE the timed window — alternating
        heavy write jobs otherwise take the stop-the-world pause of the
        previous one's garbage at an arbitrary point inside the
        measurement (observed: the same 45M-row write timing 7 s or
        47 s depending on which rep the pause landed in)."""
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1)

    work = tempfile.mkdtemp(prefix="zorder_scale_")
    out: dict[str, dict[str, float]] = {}
    try:
        sink = WarehouseSink(spark)
        for scale in scales:
            n = args.base * scale
            src = os.path.join(work, f"src_{scale}")
            # independent uniform (x, y) coordinates (row-major index
            # split — y does NOT determine x or vice versa), scattered
            # on the payload: the worst layout for either dimension
            (
                spark.range(n)
                .select(
                    (F.col("id") % GRID).alias("x"),
                    ((F.col("id") / GRID).cast("long") % GRID).alias("y"),
                    F.col("id").alias("payload"),
                )
                .repartition(64, "payload")
                .write.mode("overwrite")
                .parquet(src)
            )
            # FIXED file count across scales: scaling files with input
            # would conflate two variables (at 480 output files the
            # shared-host IO noise swamps the signal — samples swing
            # 2-3x); production sizes files to ~1 GB, which at these
            # volumes is a handful either way
            files = 64

            singles: list[float] = []
            zorders: list[float] = []
            for rep in range(args.reps):
                by_x = os.path.join(work, f"by_x_{scale}_{rep}")
                by_z = os.path.join(work, f"by_z_{scale}_{rep}")
                # baseline: the production single-key clustered writer
                settle()
                t0 = time.monotonic()
                res = sink.load_clustered(
                    spark.read.parquet(src), by_x, ["x"], n_files=files
                )
                if not res.success:
                    raise RuntimeError(res.error)
                singles.append(time.monotonic() - t0)

                settle()
                t0 = time.monotonic()
                zorder_compact(spark, src, by_z, ["x", "y"], bits=10,
                               target_files=files)
                zorders.append(time.monotonic() - t0)
                shutil.rmtree(by_x, ignore_errors=True)
                shutil.rmtree(by_z, ignore_errors=True)

            single = statistics.median(singles)
            zorder = statistics.median(zorders)
            out[str(scale)] = {
                "rows": n,
                "single_key_sec": round(single, 2),
                "zorder_sec": round(zorder, 2),
                "ratio": round(zorder / single, 2),
                "single_samples": [round(v, 2) for v in singles],
                "zorder_samples": [round(v, 2) for v in zorders],
            }
            shutil.rmtree(src, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({"metric": "zorder_write_cost", "scales": out}))


if __name__ == "__main__":
    main()

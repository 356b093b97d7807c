#!/usr/bin/env python
"""Per-cell phase profiler (optimization round instrumentation, guide §1).

For each named query, split the bench cell's wall into:
  build   — python time to construct the DataFrame (plan building,
            includes any eager sub-actions a plan fn runs itself)
  exec    — noop-sink write (analysis+optimization+codegen+run)
plus the Catalyst phase timings reported by QueryExecution.tracker for
the final plan (analysis / optimization / planning), and the number of
Spark jobs the cell issued (statusTracker delta).

Usage: python profile_cells.py q1 q2 ...   (or no args = slowest 15)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from data_pipeline_for_real_time_retail_analytics_spark.plans import (  # noqa: E402
    copurchase as _copurchase,
    corpusbase as _corpusbase,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

DEFAULT = [
    "dup_cluster_sizes", "pair_jaccard_histogram", "dedup_clusters",
    "boilerplate_ngrams", "ngram_jaccard_pairs", "minhash_lsh_dupes",
    "boilerplate_removed_docs", "ccnet_buckets", "zordered_orders",
    "tfidf_top_terms", "cluster_safe_splits", "part_pagerank",
    "ann_eval_metrics", "bm25_search", "dedup_survivors",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.cleaner.periodicGC.interval", "45s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    sc = spark.sparkContext

    # warmup identical in spirit to bench.py
    spark.range(1000).groupBy().count().write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        fn = qs[name]
        _corpusbase.clear_caches()
        _copurchase.clear_caches()
        import gc
        gc.collect()
        jobs0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        sc.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        sc.setJobDescription(None)
        jobs1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        try:
            tracker = df._jdf.queryExecution().tracker()
            phases = {
                str(k): v.durationMs()
                for k, v in
                __import__("py4j").java_gateway.JavaObject.__dict__ and []
            }
        except Exception:
            phases = {}
        # simpler: pull phases via the scala map -> json
        try:
            jt = df._jdf.queryExecution().tracker().phases()
            it = jt.iterator()
            phases = {}
            while it.hasNext():
                kv = it.next()
                ph = kv._1()
                summ = kv._2()
                phases[str(ph)] = int(summ.durationMs())
        except Exception as e:
            phases = {"err": str(e)}
        out[name] = {
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "n_jobs": jobs1 - jobs0,
            "phases_ms": phases,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("== summary ==")
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

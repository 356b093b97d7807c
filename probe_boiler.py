#!/usr/bin/env python
"""Stage dissection of remove_boilerplate_spans (r13)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.boilerplate import (
    flagged_grams,
    positional_ngrams,
    remove_boilerplate_spans,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.textstats import (
    ws_tokens,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.corpusbase import _docs

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master("local[32]")
    .appName("probe_boiler")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def t(label, df, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print(f"  {best:7.2f}s  {label}", flush=True)


docs = _docs(spark, SF_DIR)
n = 5
tokd = docs.select(F.col("doc_id"), ws_tokens(F.col("text")).alias("w"))
t("tokd", tokd)
pg = positional_ngrams(tokd, n)
t("pg (positional ngrams)", pg)
fg = flagged_grams(pg, 2)
t("flagged_grams", fg)
matched = pg.join(fg.hint("merge"), "gram").select("doc_id", "p").distinct()
t("matched", matched)
covered = matched.select(
    "doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + (n - 1))).alias("q")
).distinct()
t("covered", covered)
toks = tokd.select("doc_id", F.posexplode("w").alias("q0", "tok")).select(
    "doc_id", (F.col("q0") + 1).alias("q"), "tok"
)
t("toks", toks)
kept = toks.join(covered.hint("merge"), ["doc_id", "q"], "left_anti")
t("kept", kept)
full = remove_boilerplate_spans(docs, n=n, min_docs=2)
t("FULL remove_boilerplate_spans", full)
spark.stop()

#!/usr/bin/env python
"""Split _banded_signatures into sub-phases and time each (r13)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.dedup import (
    _h32,
    _MH_MOD,
    minhash_band_keys,
    plant_near_dups,
    with_shingles,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.corpusbase import (
    PLANT_EVERY_DOCS,
    ID_OFFSET,
    _docs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def t(label, df, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print(f"  {best:7.2f}s  {label}", flush=True)


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).groupBy().count().write.format("noop").mode("overwrite").save()

    num_perm, bands = 12, 3
    rows = num_perm // bands

    raw = _docs(spark, SF_DIR)
    t("docs (load+repartition)", raw)
    planted = plant_near_dups(raw, every=PLANT_EVERY_DOCS, id_offset=ID_OFFSET)
    t("planted", planted)
    sh = with_shingles(planted, 3, "text", "doc_id")
    t("shingles", sh)
    hp = sh.withColumn(
        "hp",
        F.transform(
            "shingles",
            lambda s: F.struct(_h32(s, 1).alias("h1"), _h32(s, 9).alias("h2")),
        ),
    )
    t("hp (md5 structs)", hp)
    seeds = F.sequence(F.lit(0), F.lit(num_perm - 1))
    sig = hp.select(
        "doc_id",
        "shingles",
        "n_shingles",
        F.aggregate(
            F.col("hp"),
            F.array_repeat(F.lit(_MH_MOD).cast("long"), num_perm),
            lambda acc, p: F.zip_with(
                acc,
                seeds,
                lambda a, i: F.least(
                    a, F.pmod(p["h1"] + i.cast("long") * p["h2"], F.lit(_MH_MOD))
                ),
            ),
        ).alias("sig"),
    )
    t("sig (fold)", sig)
    banded = sig.select(
        "doc_id",
        "n_shingles",
        "shingles",
        F.posexplode(minhash_band_keys(F.col("sig"), bands, rows)).alias(
            "band_id", "band_key"
        ),
    )
    t("banded (band keys)", banded)

    # alternative: explode + codegen'd groupBy with num_perm min aggs,
    # then join the arrays back on doc_id
    ex = sh.select(
        "doc_id",
        F.explode("shingles").alias("s"),
    ).select(
        "doc_id",
        _h32(F.col("s"), 1).alias("h1"),
        _h32(F.col("s"), 9).alias("h2"),
    )
    aggs = [
        F.min(
            F.pmod(F.col("h1") + F.lit(i) * F.col("h2"), F.lit(_MH_MOD))
        ).alias(f"m{i}")
        for i in range(num_perm)
    ]
    sig2 = ex.groupBy("doc_id").agg(*aggs).select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("sig")
    )
    t("sig2 (explode+groupBy)", sig2)
    joined = sig2.join(sh, "doc_id").select(
        "doc_id", "n_shingles", "shingles", "sig"
    )
    banded2 = joined.select(
        "doc_id",
        "n_shingles",
        "shingles",
        F.posexplode(minhash_band_keys(F.col("sig"), bands, rows)).alias(
            "band_id", "band_key"
        ),
    )
    t("banded2 (explode+groupBy+join)", banded2)

    # sanity: identical signatures?
    diff = (
        sig.select("doc_id", "sig")
        .exceptAll(sig2.select("doc_id", "sig"))
        .count()
    )
    print(f"  sig vs sig2 mismatch rows: {diff}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

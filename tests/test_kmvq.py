"""KMV distinct sketch (plans/kmvq.py, operators/kmv.py): driver-style
DuckDB parity plus the sketch-law pins (mergeability, error bound,
salt-invariance)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.kmv import (
    bottom_k_hashes,
    distinct_hashes,
    kmv_estimate,
    kmv_sketch,
    merge_kmv_estimate,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import kmvq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["documents"], SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(kmvq.QUERIES))
def test_parity(spark, ddb, name):
    spark_pdf = kmvq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(kmvq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_estimate_within_kmv_error_bound(spark):
    """Relative error must respect the 1/sqrt(k) law (3 sigma slack):
    the estimator actually estimates, on every source group."""
    rows = kmvq.QUERIES["kmv_distinct_tokens"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.n_kept < kmvq.K:
            assert r.est_distinct == r.exact_distinct
        else:
            rel = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
            assert rel <= 3.0 / (kmvq.K ** 0.5), (r.source, rel)


def test_merged_sketch_equals_direct_union_sketch(spark, sf_dir):
    """Mergeability, the sketch's point: bottom-k over the concatenated
    per-group sketches == bottom-k over the union's distinct hashes."""
    df = spark.createDataFrame(
        [
            (g, f"v{(i * mult) % 397}")
            for g, mult in (("a", 1), ("b", 3), ("c", 7))
            for i in range(300)
        ],
        "g string, v string",
    )
    per_group = kmv_sketch(df, "v", ["g"], k=64, n_salts=4)
    merged = merge_kmv_estimate(per_group, k=64).collect()[0]
    direct = kmv_estimate(
        bottom_k_hashes(
            distinct_hashes(df.select(F.lit(1).alias("one"), "v"), "v", ["one"]),
            ["one"],
            k=64,
            n_salts=4,
        ),
        ["one"],
        k=64,
    ).collect()[0]
    assert merged.n_kept == direct.n_kept
    assert merged.kth_hash == direct.kth_hash
    assert merged.est_distinct == direct.est_distinct


def test_salt_count_does_not_change_the_sketch(spark):
    """The salted two-phase selection is an implementation detail: any
    n_salts must yield the identical bottom-k rows."""
    df = spark.range(500).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("tok"), (F.col("id") % 211).cast("string")).alias("v"),
    )
    a = kmv_sketch(df, "v", ["g"], k=32, n_salts=1).orderBy("g", "rank").collect()
    b = kmv_sketch(df, "v", ["g"], k=32, n_salts=16).orderBy("g", "rank").collect()
    assert a == b


def test_small_group_returns_exact_count(spark):
    """Below k distinct values the sketch IS the set: est == exact."""
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10)], "g string, v string"
    )
    est = kmv_estimate(kmv_sketch(df, "v", ["g"], k=64), ["g"], k=64).collect()[0]
    assert est.n_kept == 10
    assert est.est_distinct == 10

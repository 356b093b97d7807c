"""Grouped-aggregate pandas UDF query (plans/udxq.py): driver-style
DuckDB parity plus the native-percentile twin pin."""

import os

import duckdb
import pytest

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.plans import udxq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["documents"], SF_DIR)
    yield con
    con.close()


def test_parity(spark, ddb):
    spark_pdf = udxq.QUERIES["lang_median_tokens"](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(udxq.ORACLES["lang_median_tokens"]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, "lang_median_tokens")


def test_udaf_median_equals_native_percentile(spark):
    """The Arrow UDF must agree bit-for-bit with Spark's own exact
    interpolated percentile(0.5) on the same integer data — the
    structural x.0/x.5 exactness the module docstring claims."""
    from pyspark.sql import functions as F

    from data_pipeline_for_real_time_retail_analytics_spark.functions.udx import (
        make_median_udaf,
    )

    rows = [("a", v) for v in (1, 7, 2, 9)] + [("b", v) for v in (5, 3, 8)]
    df = spark.createDataFrame(rows, "g string, v long")
    median = make_median_udaf()
    got = {
        r["g"]: r["m"]
        for r in df.groupBy("g").agg(median(F.col("v")).alias("m")).collect()
    }
    want = {
        r["g"]: r["m"]
        for r in df.groupBy("g")
        .agg(F.expr("percentile(v, 0.5)").alias("m"))
        .collect()
    }
    assert got == want == {"a": 4.5, "b": 5.0}


def test_udaf_median_null_handling(spark):
    from pyspark.sql import functions as F

    from data_pipeline_for_real_time_retail_analytics_spark.functions.udx import (
        make_median_udaf,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", None)], "g string, v long"
    )
    median = make_median_udaf()
    got = {
        r["g"]: r["m"]
        for r in df.groupBy("g").agg(median(F.col("v")).alias("m")).collect()
    }
    assert got == {"a": 1.0, "b": None}

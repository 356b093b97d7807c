"""Stream–static join query (plans/streamq2.py): driver-style DuckDB
parity from a REAL AvailableNow streaming execution, plus the
broadcast-enrichment plan promise."""

import os

import duckdb
import pytest

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.plans import streamq2

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["events", "customer"], SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(streamq2.ORACLES))
def test_parity(spark, ddb, name):
    spark_pdf = streamq2.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(streamq2.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_dim_join_is_broadcast(spark):
    """The enrichment join must broadcast the bounded dim, never
    shuffle the stream — checked on the batch twin of the streaming
    plan (same join subtree, introspectable without an execution)."""
    from pyspark.sql import functions as F

    from data_pipeline_for_real_time_retail_analytics_spark.sources import (
        load_table,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.streaming.ingest import (
        windowed_aggregate,
    )

    events = load_table(spark, SF_DIR, "events")
    dim = F.broadcast(
        load_table(spark, SF_DIR, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    agg = windowed_aggregate(
        events.join(dim, "user_id"), window="1 hour",
        group_extra=["c_mktsegment"],
    )
    plan = agg._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

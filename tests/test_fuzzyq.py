"""Blocked fuzzy matching (plans/fuzzyq.py, operators/fuzzy.py):
driver-style DuckDB parity plus the blocking-contract pins."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.fuzzy import (
    blocked_fuzzy_pairs,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import fuzzyq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["customer"], SF_DIR)
    yield con
    con.close()


def test_parity(spark, ddb):
    name = "fuzzy_customer_pairs"
    spark_pdf = fuzzyq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(fuzzyq.ORACLES[name]).fetchdf()
    assert len(spark_pdf) > 0
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_typo_pair_found_and_cross_block_pair_not(spark):
    """A one-char typo in the same block matches; the identical typo
    across blocks does not (blocking bounds candidates BY DESIGN —
    recall across blocks is a second pass with another key)."""
    df = spark.createDataFrame(
        [
            (1, "acme corp", "us"),
            (2, "acme c0rp", "us"),   # 1 edit, same block
            (3, "acme c0rp", "eu"),   # 1 edit, other block
            (4, "completely else", "us"),
        ],
        "id long, name string, region string",
    )
    out = blocked_fuzzy_pairs(df, "id", "name", "region", max_dist=1).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert pairs == {(1, 2)}
    assert all(r.dist <= 1 for r in out)


def test_canonical_ordering_no_self_pairs(spark):
    """id_a < id_b always: no self pairs, no mirrored duplicates."""
    df = spark.createDataFrame(
        [(i, f"name{i}", "b") for i in range(5)],
        "id long, name string, blk string",
    )
    out = blocked_fuzzy_pairs(df, "id", "name", "blk", max_dist=2).collect()
    assert all(r.id_a < r.id_b for r in out)
    assert len({(r.id_a, r.id_b) for r in out}) == len(out)


def test_oversized_block_fails_loudly(spark):
    """The quadratic guard: one block over max_block must raise at
    action time, not silently run |block|² comparisons. The error may
    surface as SparkRuntimeException or wrapped in an AQE
    stage-materialization failure (the guard sits below a repartition
    exchange) — what matters is the loud, attributable message."""
    df = spark.range(50).select(
        F.col("id"), F.lit("same name").alias("name"), F.lit("one").alias("blk")
    )
    with pytest.raises(Exception, match="max_block"):
        blocked_fuzzy_pairs(df, "id", "name", "blk", max_block=10).collect()


def test_computed_block_expression(spark):
    """block_col accepts an expression — prefix blocking, the usual
    second pass for cross-attribute recall."""
    df = spark.createDataFrame(
        [(1, "smith john"), (2, "smith jon"), (3, "smyth john")],
        "id long, name string",
    )
    out = blocked_fuzzy_pairs(
        df, "id", "name", F.substring("name", 1, 3), max_dist=2
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in pairs        # same 'smi' block, dist 1
    assert (1, 3) not in pairs    # 'smy' block differs — by design


def test_deletion_neighborhood_equals_all_pairs(spark):
    """r13 fast path: at max_dist=1 the operator takes the FastSS
    deletion-neighborhood candidate join. Pin it against the all-pairs
    formulation (max_dist=2 filtered down to dist<=1 — same quadratic
    join, same exact DP) on strings that exercise every edit kind:
    equality, substitution, insertion/deletion at every position,
    repeated characters (duplicate deletion variants), empty strings,
    and multi-byte unicode."""
    rows = [
        (1, "abc"), (2, "abc"),        # equality
        (3, "abd"),                    # substitution (vs abc)
        (4, "abcd"), (5, "bcd"),       # deletion at ends
        (6, "aabc"),                   # insertion with repeat
        (7, ""), (8, ""), (9, "a"),    # empties: lev=0 and lev=1
        (10, "aaaa"), (11, "aaa"),     # all-repeat
        (12, "héllo"), (13, "hállo"),  # multi-byte substitution
        (14, "xyz"),                   # far from everything
    ]
    df = spark.createDataFrame(rows, ["id", "name"]).withColumn(
        "blk", F.lit(0)
    )
    fast = blocked_fuzzy_pairs(
        df, id_col="id", text_col="name", block_col="blk", max_dist=1
    )
    slow = blocked_fuzzy_pairs(
        df, id_col="id", text_col="name", block_col="blk", max_dist=2
    ).where(F.col("dist") <= 1)
    fr = sorted(tuple(r) for r in fast.collect())
    sr = sorted(tuple(r) for r in slow.collect())
    assert fr == sr
    assert len(fr) > 0

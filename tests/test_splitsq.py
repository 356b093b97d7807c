"""Cluster-safe splits (plans/splitsq.py): driver-style DuckDB parity
plus the zero-leakage and accounting pins."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.sampling import (
    train_val_test_split,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import splitsq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["documents"], SF_DIR)
    yield con
    con.close()


def test_parity(spark, ddb):
    name = "cluster_safe_splits"
    spark_pdf = splitsq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(splitsq.ORACLES[name]).fetchdf()
    assert set(spark_pdf.split) == {"train", "val", "test"}
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_no_cluster_straddles_splits(spark):
    """The invariant the query exists for: every near-dup cluster lands
    wholly inside one split."""
    assigned = splitsq.assigned_clusters(spark, SF_DIR)
    split = train_val_test_split(assigned, id_col="cluster_id")
    straddlers = (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert straddlers == 0


def test_doc_keyed_split_would_leak_here(spark):
    """The counterfactual that motivates the operator: on the SAME
    corpus, splitting by doc id DOES put some near-dup cluster on both
    sides of a split boundary (planted mutants have ids offset by 10M,
    so their hash buckets are independent of their originals')."""
    assigned = splitsq.assigned_clusters(spark, SF_DIR)
    split = train_val_test_split(assigned, id_col="doc_id")
    straddlers = (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert straddlers > 0


def test_accounting_is_exhaustive(spark):
    """Split doc counts sum to the planted corpus size; cluster counts
    sum to the total cluster count (no cluster straddles, so per-split
    cluster counts are disjoint)."""
    out = splitsq.QUERIES["cluster_safe_splits"](spark, SF_DIR).toPandas()
    assigned = splitsq.assigned_clusters(spark, SF_DIR)
    assert out.n_docs.sum() == assigned.count()
    assert out.n_clusters.sum() == assigned.select("cluster_id").distinct().count()

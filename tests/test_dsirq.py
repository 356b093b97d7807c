"""DSIR importance selection (plans/dsirq.py, operators/dsir.py):
driver-style DuckDB parity plus semantics pins."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.dsir import (
    doc_bucket_counts,
    dsir_top_k,
    dsir_weights,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import dsirq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["documents"], SF_DIR)
    yield con
    con.close()


def test_parity(spark, ddb):
    spark_pdf = dsirq.QUERIES["dsir_selected"](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(dsirq.ORACLES["dsir_selected"]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, "dsir_selected")


def test_selection_skews_to_target(spark, ddb):
    """The whole point: the selected slice must over-represent the
    target language relative to its corpus base rate (measured 57%
    selected vs ~44% base at sf0.01)."""
    sel = dsirq.QUERIES["dsir_selected"](spark, SF_DIR).toPandas()
    ids = ",".join(str(i) for i in sel.doc_id)
    n_en_sel = ddb.execute(
        f"SELECT count(*) FROM documents WHERE doc_id IN ({ids}) "
        f"AND lang = '{dsirq.TARGET_LANG}'"
    ).fetchone()[0]
    n, n_en = ddb.execute(
        f"SELECT count(*), "
        f"sum(CASE WHEN lang = '{dsirq.TARGET_LANG}' THEN 1 ELSE 0 END) "
        f"FROM documents"
    ).fetchone()
    assert n_en_sel / len(sel) > n_en / n


def test_target_lookalikes_rank_first(spark):
    """Hand-built corpus: docs made of the target's vocabulary must
    out-rank docs made of off-target vocabulary."""
    rows = (
        # target domain: docs 0-1 (vocabulary: alpha/beta/gamma)
        [(0, "alpha beta gamma alpha"), (1, "beta gamma alpha beta")]
        # lookalike written in target vocabulary: doc 2
        + [(2, "gamma alpha beta gamma")]
        # off-domain vocabulary: docs 3-4
        + [(3, "delta epsilon zeta delta"), (4, "epsilon zeta delta zeta")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = doc_bucket_counts(df, n_buckets=64).localCheckpoint()
    target = counts.where(F.col("doc_id") <= 1)
    top = dsir_top_k(
        dsir_weights(counts, target, n_buckets=64), k=3
    ).collect()
    assert {r["doc_id"] for r in top} == {0, 1, 2}


def test_weight_table_is_broadcast(spark):
    """The 256-row weight table must broadcast into the scoring join —
    never shuffle the corpus-side counts on the bucket key alone."""
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} shared") for i in range(20)],
        "doc_id long, text string",
    )
    counts = doc_bucket_counts(docs, n_buckets=64).localCheckpoint()
    plan = dsir_weights(
        counts, counts.where(F.col("doc_id") < 5), n_buckets=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_empty_target_raises(spark):
    """An empty target domain must fail loudly, not produce NULL
    weights for every document."""
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    )
    counts = doc_bucket_counts(docs, n_buckets=16)
    weights = dsir_weights(
        counts, counts.where(F.col("doc_id") < 0), n_buckets=16
    )
    with pytest.raises(Exception, match="target_counts is empty"):
        weights.collect()

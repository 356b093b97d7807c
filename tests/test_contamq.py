"""Semantic decontamination (plans/contamq.py): driver-style DuckDB
parity plus the planted-leak guarantees."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.semcontam import (
    contaminated_train_ids,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import contamq
from data_pipeline_for_real_time_retail_analytics_spark.plans.llm import _embs

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["embeddings"], SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(contamq.ORACLES))
def test_parity(spark, ddb, name):
    spark_pdf = contamq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(contamq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_every_planted_leak_is_flagged(spark):
    """Each eval vector is an exact copy of a training vector, so its
    twin MUST be in the flag set (exact copies always share the sign
    bucket), and the removal set must contain every twin."""
    pairs = contamq.q_semantic_contamination(spark, SF_DIR)
    flagged = {(r.eval_id, r.train_id) for r in pairs.collect()}
    planted = {
        r.vec_id
        for r in _embs(spark, SF_DIR)
        .where(F.col("vec_id") % contamq.EVAL_EVERY == 0)
        .select("vec_id")
        .collect()
    }
    for train_id in planted:
        assert (train_id + contamq.EVAL_ID_OFFSET, train_id) in flagged
    removal = {r.train_id for r in contaminated_train_ids(pairs).collect()}
    assert planted <= removal

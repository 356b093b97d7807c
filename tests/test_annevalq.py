"""ANN evaluation harness (plans/annevalq.py): driver-style DuckDB
parity plus the ladder-shape pins that make the metric trustworthy."""

import os

import duckdb
import pytest

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.plans import annevalq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["embeddings"], SF_DIR)
    yield con
    con.close()


def test_parity(spark, ddb):
    spark_pdf = annevalq.QUERIES["ann_eval_metrics"](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(annevalq.ORACLES["ann_eval_metrics"]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, "ann_eval_metrics")


def test_recall_ladder_shape(spark):
    """The structural claims: bounds hold, the amplification variants
    strictly dominate the single table (the reason they exist), and the
    multitable row clears a useful-recall floor while staying below
    perfect (the index is genuinely approximate on isotropic noise)."""
    rows = {r.variant: r for r in
            annevalq.QUERIES["ann_eval_metrics"](spark, SF_DIR).collect()}
    assert set(rows) == {"single", "multiprobe", "multitable"}
    base = rows["single"]
    for r in rows.values():
        assert r.n_queries == base.n_queries and r.n_truth == base.n_truth
        assert 0 <= r.n_hits <= r.n_truth
        assert 0 <= r.recall_ppm <= 1_000_000
        assert 0 <= r.mrr_micro <= 1_000_000
    assert rows["multiprobe"].n_hits > rows["single"].n_hits
    assert rows["multitable"].n_hits > rows["multiprobe"].n_hits
    assert rows["multitable"].recall_ppm >= 500_000
    assert rows["multitable"].recall_ppm < 1_000_000

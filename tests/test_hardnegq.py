"""Hard-negative mining (plans/hardnegq.py): driver-style DuckDB parity
plus the false-negative pin — the reason the exclusion exists."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
    cosine_topk,
    plant_dup_vectors,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import hardnegq
from data_pipeline_for_real_time_retail_analytics_spark.plans.llm import (
    ID_OFFSET,
    PLANT_EVERY_VECS,
    _embs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["embeddings"], SF_DIR)
    yield con
    con.close()


def test_parity(spark, ddb):
    spark_pdf = hardnegq.QUERIES["hard_negatives"](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(hardnegq.ORACLES["hard_negatives"]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, "hard_negatives")


def test_naive_mining_would_surface_the_positive(spark):
    """WITHOUT the exclusion, every anchor's rank-1 'negative' is its
    planted exact copy (cosine 1.0) — the false-negative poisoning the
    query exists to prevent; WITH it, no positive appears at any rank
    and every returned similarity is below the positive's."""
    planted = plant_dup_vectors(
        _embs(spark, SF_DIR), every=PLANT_EVERY_VECS, id_offset=ID_OFFSET
    )
    anchors = _embs(spark, SF_DIR).where(
        F.col("vec_id") % PLANT_EVERY_VECS == 0
    )
    naive = {
        r.query_id: r.match_id
        for r in cosine_topk(anchors, planted, k=1).collect()
    }
    assert naive, "no anchors — workload inert"
    assert all(m == q + ID_OFFSET for q, m in naive.items()), (
        "planting changed: the exact copy is no longer rank 1"
    )
    mined = hardnegq.QUERIES["hard_negatives"](spark, SF_DIR).collect()
    assert mined
    for r in mined:
        assert r.match_id != r.query_id + ID_OFFSET
        assert r.match_id != r.query_id
        assert r.cosine_sim < 1.0
    ranks = {}
    for r in mined:
        ranks.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in ranks.values())

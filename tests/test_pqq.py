"""Product-quantization (plans/pqq.py, operators/pq.py): driver-style
DuckDB parity plus behavior pins on hand-checkable geometry."""

import os

import duckdb
import pytest

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.pq import (
    pq_adc_topk,
    pq_codebooks,
    pq_codes,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import pqq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["embeddings"], SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(pqq.ORACLES))
def test_parity(spark, ddb, name):
    spark_pdf = pqq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(pqq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def _tiny(spark):
    # dim 4, m=2 blocks of 2; k=2 seeds = vecs 0 and 1
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 1.0, 1.0, 1.0]),
        (2, [0.1, 0.0, 0.9, 1.0]),  # block0 → seed0, block1 → seed1
        (3, [1.0, 0.9, 0.1, 0.0]),  # block0 → seed1, block1 → seed0
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_codes_pack_expected_blocks(spark):
    """Hand-checkable assignment + 4-bit packing: word = Σ code·16^sub."""
    corpus = _tiny(spark)
    cb = pq_codebooks(corpus, m=2, k=2)
    got = {
        r["vec_id"]: r["pq_word"]
        for r in pq_codes(corpus, cb).collect()
    }
    # vec0: (0,0) → 0; vec1: (1,1) → 1 + 16; vec2: (0,1) → 16; vec3: (1,0) → 1
    assert got == {0: 0, 1: 17, 2: 16, 3: 1}


def test_adc_exact_when_vector_is_a_seed(spark):
    """A corpus vector that IS a sub-centroid on every block encodes
    losslessly, so its ADC distance equals the exact quantized L2 —
    pinned via seed 1 scored against query seed 0 (distance = 4 dims of
    1.0² = 4e12 micro-units)."""
    corpus = _tiny(spark)
    cb = pq_codebooks(corpus, m=2, k=2)
    queries = corpus.where("vec_id = 0")
    top = {
        r["match_id"]: r["adc_dist_q12"]
        for r in pq_adc_topk(queries, corpus, cb, k=3).collect()
    }
    assert top[1] == 4 * 10**12


def test_dim_not_divisible_raises(spark):
    bad = spark.createDataFrame(
        [(0, [0.0, 1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    cb = pq_codebooks(bad, m=2, k=1)
    with pytest.raises(Exception, match="not divisible"):
        cb.collect()


def test_adc_plan_is_broadcast_lookup(spark):
    """The scoring join must broadcast the lookup table (m·k rows per
    query), never shuffle the codes side on a non-key — and the corpus
    side of scoring reads codes only."""
    corpus = _tiny(spark)
    cb = pq_codebooks(corpus, m=2, k=2)
    queries = corpus.where("vec_id = 0")
    plan = pq_adc_topk(
        queries, corpus, cb, k=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_wide_codebook_packing_raises(spark):
    """A codebook with k > 16 cannot 4-bit-pack: distinct code
    sequences would collide in pq_word, so packing must raise instead
    of silently corrupting the compressed representation."""
    rows = [(i, [float(i), float(i % 3)]) for i in range(20)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    cb = pq_codebooks(corpus, m=1, k=20)
    with pytest.raises(Exception, match="4-bit packing"):
        pq_codes(corpus, cb).collect()

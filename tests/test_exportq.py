"""Export shard manifest (plans/exportq.py): driver-style DuckDB
parity plus the integrity semantics the checksum exists for."""

import os

import duckdb
import pytest

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.plans import exportq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["documents"], SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(exportq.ORACLES))
def test_parity(spark, ddb, name):
    spark_pdf = exportq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(exportq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_manifest_accounts_for_every_document(spark):
    m = exportq.q_shard_manifest(spark, SF_DIR).collect()
    from data_pipeline_for_real_time_retail_analytics_spark.plans.llm import _docs

    assert sum(r.n_docs for r in m) == _docs(spark, SF_DIR).count()
    for r in m:
        assert r.max_pos == r.n_docs, f"shard {r.shard} has position gaps"


def test_checksum_detects_a_dropped_document(spark):
    """XOR checksums must differ when one document goes missing —
    the manifest's whole purpose."""
    from pyspark.sql import functions as F

    from data_pipeline_for_real_time_retail_analytics_spark.operators.packing import (
        shuffle_shards,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.llm import _docs

    docs = _docs(spark, SF_DIR).select("doc_id")
    full = shuffle_shards(docs, "doc_id", n_shards=exportq.N_SHARDS)
    victim = full.first()
    truncated = docs.where(F.col("doc_id") != victim.doc_id)

    def manifest(d):
        return {
            r.shard: r.checksum
            for r in shuffle_shards(d, "doc_id", n_shards=exportq.N_SHARDS)
            .withColumn("ck", exportq._doc_checksum("doc_id"))
            .groupBy("shard")
            .agg(F.expr("bit_xor(ck)").alias("checksum"))
            .collect()
        }

    a, b = manifest(docs), manifest(truncated)
    assert a[victim.shard] != b.get(victim.shard), (
        "checksum unchanged after dropping a document"
    )
    unaffected = [s for s in a if s != victim.shard]
    assert all(a[s] == b[s] for s in unaffected), (
        "dropping one document must not disturb other shards"
    )

"""Deterministic sampling/split tests: stability across runs and
partitionings — the property `df.sample()` does NOT have."""

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    train_val_test_split,
)
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table


def test_split_disjoint_exhaustive_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    split = train_val_test_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == total  # exhaustive
    # identical membership regardless of physical partitioning
    again = train_val_test_split(docs.repartition(7), "doc_id")
    a = {(r["doc_id"], r["split"]) for r in split.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in again.select("doc_id", "split").collect()}
    assert a == b


def test_deterministic_sample_reproducible(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    assert s1 == s2
    # a larger rate strictly contains the smaller one (nested samples)
    s5 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.5).collect()}
    assert s1 <= s5
    n = docs.count()
    assert 0.1 * n < len(s1) < 0.3 * n  # roughly the requested rate


def test_stratified_rates_respected(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, "doc_id", "lang", rates={"en": 0.0, "es": 1.0}, default_rate=0.0
    )
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"es"}  # en fully dropped, others defaulted to 0
    n_es = docs.where(F.col("lang") == "es").count()
    assert out.count() == n_es  # es kept in full

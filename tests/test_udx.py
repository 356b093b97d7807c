"""§2.11 UDTF / grouped-agg pandas-UDF surface: each Python form must
agree EXACTLY with its native column-expression twin on real data —
the twins are the production path; the Python forms exist for logic
that genuinely cannot be expressed natively, and these tests are the
proof they compute the same thing when both can.
"""

import pytest
from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.functions.udx import (
    make_chunk_udtf,
    make_weighted_mean_udaf,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.textstats import (
    chunk_documents,
)
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table


def test_chunk_udtf_agrees_with_native_chunker(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    native = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, chunk_tokens=16, overlap=4).collect()
    }
    spark.udtf.register("chunk_udtf", make_chunk_udtf())
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_id, c.chunk_text, c.n_tokens "
            "FROM udtf_docs d, LATERAL chunk_udtf(d.text, 16, 4) c"
        ).collect()
    }
    assert via_udtf == native and len(native) > 0


def test_chunk_udtf_rejects_degenerate_overlap(spark):
    spark.udtf.register("chunk_udtf_bad", make_chunk_udtf())
    df = spark.createDataFrame([("a b c",)], "text string")
    df.createOrReplaceTempView("udtf_bad_docs")
    with pytest.raises(Exception, match="overlap"):
        spark.sql(
            "SELECT c.* FROM udtf_bad_docs d, "
            "LATERAL chunk_udtf_bad(d.text, 4, 4) c"
        ).collect()


def test_weighted_mean_udaf_agrees_with_native(spark, sf_dir):
    """Weighted mean of lineitem price by quantity per return flag:
    pandas grouped-agg UDF vs the native Σ(v·w)/Σ(w) expression."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").alias("w"),
    )
    via_udaf = {
        r["l_returnflag"]: round(r["wm"], 6)
        for r in li.groupBy("l_returnflag")
        .agg(make_weighted_mean_udaf()("v", "w").alias("wm"))
        .collect()
    }
    native = {
        r["l_returnflag"]: round(r["wm"], 6)
        for r in li.groupBy("l_returnflag")
        .agg(
            (F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm")
        )
        .collect()
    }
    assert set(via_udaf) == set(native)
    for k in native:
        assert via_udaf[k] == pytest.approx(native[k], rel=1e-12)

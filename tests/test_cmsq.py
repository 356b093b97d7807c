"""Count-min sketch (plans/cmsq.py, operators/cms.py): driver-style
DuckDB parity plus the sketch-law pins (one-sided error, linearity of
the merge, depth monotonicity)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.cms import (
    cms_cells,
    cms_estimate,
    merge_cms_cells,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import cmsq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["documents"], SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(cmsq.QUERIES))
def test_parity(spark, ddb, name):
    spark_pdf = cmsq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(cmsq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def _counts(spark, rows):
    return spark.createDataFrame(rows, "g string, v string, c long")


def test_estimate_never_undercounts(spark):
    """The CMS guarantee: est >= exact for EVERY candidate, not just the
    ranked top rows — checked over the full candidate set on the real
    corpus."""
    toks = cmsq._toks(spark, SF_DIR)
    counts = toks.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint()
    est = cms_estimate(cms_cells(counts, "t", "c"), cmsq._candidates(toks), "t")
    bad = est.join(counts, "t").where(F.col("est_count") < F.col("c")).count()
    assert bad == 0


def test_merged_cells_equal_direct_cells(spark):
    """Linearity, the merge's whole point: per-group cells summed
    cell-wise == cells of the union stream, bit-for-bit."""
    rows = [
        (g, f"v{(i * mult) % 97}", (i % 5) + 1)
        for g, mult in (("a", 1), ("b", 3), ("c", 7))
        for i in range(200)
    ]
    df = _counts(spark, rows)
    per_value = df.groupBy("g", "v").agg(F.sum("c").cast("long").alias("c"))
    merged = merge_cms_cells(
        cms_cells(per_value, "v", "c", ["g"], depth=3, width=64), ["g"]
    )
    direct = cms_cells(
        df.groupBy("v").agg(F.sum("c").cast("long").alias("c")), "v", "c",
        depth=3, width=64,
    )
    diff = (
        merged.alias("m")
        .join(direct.alias("d"), ["r", "col"], "full")
        .where(
            F.coalesce(F.col("m.cell"), F.lit(-1))
            != F.coalesce(F.col("d.cell"), F.lit(-1))
        )
        .count()
    )
    assert diff == 0


def test_narrow_width_forces_visible_overcounts_and_depth_helps(spark):
    """With width << vocabulary, collisions must appear (the estimate
    actually estimates), and a deeper sketch can only LOWER estimates
    (min over more rows)."""
    df = _counts(spark, [("g", f"v{i}", 1) for i in range(200)])
    per_value = df.groupBy("v").agg(F.sum("c").cast("long").alias("c"))
    cand = per_value.select("v")
    est_d1 = cms_estimate(
        cms_cells(per_value, "v", "c", depth=1, width=8), cand, "v",
        depth=1, width=8,
    ).withColumnRenamed("est_count", "e1")
    est_d3 = cms_estimate(
        cms_cells(per_value, "v", "c", depth=3, width=8), cand, "v",
        depth=3, width=8,
    ).withColumnRenamed("est_count", "e3")
    joined = est_d1.join(est_d3, "v").join(per_value, "v")
    assert joined.where(F.col("e3") > F.col("c")).count() > 0
    assert joined.where(F.col("e3") > F.col("e1")).count() == 0
    assert joined.where(F.col("e3") < F.col("c")).count() == 0


def test_out_of_corpus_candidate_estimates_zero_or_collision(spark):
    """A probe value never inserted gets the collision mass of its
    cells — and exactly 0 when its cells are untouched (the explicit
    left-join coalesce path)."""
    per_value = _counts(spark, [("g", "only", 1000)]).groupBy("v").agg(
        F.sum("c").cast("long").alias("c")
    )
    cells = cms_cells(per_value, "v", "c", depth=3, width=512)
    cand = per_value.sparkSession.createDataFrame(
        [("absent-token-xyz",)], "v string"
    )
    [row] = cms_estimate(cells, cand, "v", depth=3, width=512).collect()
    assert row.est_count in (0, 1000)


def test_stream_cells_equal_batch_cells(spark):
    """The streaming drive's drained cell matrix must equal the batch
    build bit-for-bit (linearity across micro-batches) — proven
    engine-side at the cell grain, beneath the shared-oracle pin."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import streamcmsq

    out = streamcmsq.q_stream_cms_heavy_tokens(spark, SF_DIR).toPandas()
    batch = cmsq.q_cms_heavy_tokens(spark, SF_DIR).toPandas()
    assert out.to_dict("records") == batch.to_dict("records")


def test_stream_cells_accumulate_across_real_micro_batches(spark, tmp_path):
    """Force multiple micro-batches (one file per trigger) and prove the
    drained cells equal the batch build — linearity across ACTUAL batch
    boundaries, not just a single-batch AvailableNow pass."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.cms import (
        DEPTH,
        WIDTH,
        cms_col_hash,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.streamcmsq import (
        DOCS_SCHEMA,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.streamq import _drain
    from data_pipeline_for_real_time_retail_analytics_spark.operators.textstats import (
        ws_tokens,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.streaming.ingest import (
        file_stream,
    )

    src = str(tmp_path / "docs")
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} shared", "en", f"s{i % 2}", 20)
         for i in range(40)],
        DOCS_SCHEMA,
    )
    # four separate files => four micro-batches at one file per trigger
    docs.repartition(4).write.mode("overwrite").parquet(src)

    def targets(col):
        from pyspark.sql import functions as FF

        return FF.explode(
            FF.array(
                *[
                    FF.struct(
                        FF.lit(r).alias("r"),
                        cms_col_hash(col, r, WIDTH).alias("col"),
                    )
                    for r in range(DEPTH)
                ]
            )
        ).alias("__tgt")

    stream = file_stream(
        spark, src, schema=DOCS_SCHEMA, max_files_per_trigger=1
    )
    s_cells = (
        stream.select(F.explode(ws_tokens(F.col("text"))).alias("t"))
        .select(targets(F.col("t")))
        .select("__tgt.r", "__tgt.col")
        .groupBy("r", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cell"))
    )
    drained = {
        (r.r, r.col): r.cell
        for r in _drain(spark, s_cells, "cms_multibatch_test").collect()
    }
    batch = {
        (r.r, r.col): r.cell
        for r in (
            spark.read.parquet(src)
            .select(F.explode(ws_tokens(F.col("text"))).alias("t"))
            .select(targets(F.col("t")))
            .select("__tgt.r", "__tgt.col")
            .groupBy("r", "col")
            .agg(F.count(F.lit(1)).cast("long").alias("cell"))
        ).collect()
    }
    assert drained == batch


def test_stream_cells_identical_under_rocksdb_state_store(spark):
    """The production state-store choice at 100 TB is RocksDB (bounded
    JVM heap, state spills to local disk); the streaming sketch must
    produce the identical output under it. The provider binds at
    stream start, so flipping the session conf around the drive is
    sufficient — and the drained result must equal the batch query."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import streamcmsq

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, rocks)
    try:
        out = streamcmsq.q_stream_cms_heavy_tokens(spark, SF_DIR).toPandas()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    batch = cmsq.q_cms_heavy_tokens(spark, SF_DIR).toPandas()
    assert out.to_dict("records") == batch.to_dict("records")

"""operators/maintenance.py + plans/scaleops.py — plan-level pins for
the runtime-Bloom-filter pruning and compaction (OPTIMIZE) operators.
Value-level parity with the DuckDB twins is covered by the oracle gate;
these pin what parity can't see: the injected might_contain filter,
conf restoration, file counts, and per-file disjoint ranges."""

import glob

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.maintenance import (
    _BLOOM_CONFS,
    compact_parquet,
    runtime_bloom_filters,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import scaleops as SO
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table


def test_bloom_filter_injected_on_probe_scan(spark, sf_dir):
    """Inside the scope, the selective fetch join must carry a runtime
    Bloom filter: bloom_filter_agg on the creation side, might_contain
    on the big-table probe scan."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    ids = emb.where(F.col("label") == SO.BLOOM_LABEL).select(
        F.col("vec_id").alias("doc_id")
    )
    fetch = docs.join(ids, "doc_id").select("doc_id", "source")
    with runtime_bloom_filters(spark):
        fetch.write.format("noop").mode("overwrite").save()
        plan = fetch._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan, "no runtime Bloom filter on the probe"
    assert "bloom_filter_agg" in plan, "no Bloom build on the creation side"


def test_bloom_scope_restores_every_conf(spark):
    """The context manager must leave no conf behind — including keys
    that were UNSET before (restored to unset, not to a value)."""
    conf = spark.conf
    before = {k: conf.get(k, None) for k in _BLOOM_CONFS}
    with runtime_bloom_filters(spark):
        for k, v in _BLOOM_CONFS.items():
            assert conf.get(k) == v
    after = {k: conf.get(k, None) for k in _BLOOM_CONFS}
    assert after == before


def test_bloom_result_is_optimization_invariant(spark, sf_dir):
    """Same rows with and without the Bloom scope — the filter prunes
    I/O, never rows."""
    q = SO.q_bloom_pruned_fetch(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    plain = (
        docs.join(
            emb.where(F.col("label") == SO.BLOOM_LABEL).select(
                F.col("vec_id").alias("doc_id")
            ),
            "doc_id",
        )
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
        .toPandas()
    )
    assert q.equals(plain)


def test_compact_parquet_hits_target_and_disjoint_ranges(spark, tmp_path):
    """Compaction must land on target_files files, each owning a
    disjoint, internally-sorted range of the cluster key — the property
    parquet min/max skipping needs."""
    df = spark.range(5_000).select(
        (F.col("id") * 6271 % 5_000).alias("k"), F.col("id").alias("payload")
    )
    src = str(tmp_path / "scattered")
    dest = str(tmp_path / "compacted")
    df.repartition(16, "k").write.parquet(src)
    assert len(glob.glob(src + "/part-*.parquet")) == 16

    out = compact_parquet(spark, src, dest, ["k"], target_files=4)
    files = sorted(glob.glob(dest + "/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        ks = spark.read.parquet(f).toPandas()["k"].tolist()
        assert ks == sorted(ks), f"{f} not sorted within file"
        ranges.append((ks[0], ks[-1]))
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "file key ranges overlap — no skipping possible"
    assert out.count() == 5_000


def test_compacted_corpus_preserves_rows_and_reduces_files(spark, sf_dir):
    got = SO.q_compacted_corpus(spark, sf_dir).toPandas()
    want = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
        .toPandas()
    )
    assert got.equals(want)


def test_table_checksum_is_layout_invariant_and_detects_loss(
    spark, sf_dir, tmp_path
):
    """(n_rows, checksum) must survive any re-layout (repartition,
    column order, compaction) and must change when a row is dropped or
    doubled — the maintenance-rewrite verification contract."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.maintenance import (
        table_checksum,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = table_checksum(docs).first()

    # layout invariance: shuffle + column reorder + compaction rewrite
    reordered = docs.select(*sorted(docs.columns, reverse=True)).repartition(7)
    assert table_checksum(reordered).first() == base
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    docs.repartition(16).write.parquet(src)
    compacted = compact_parquet(spark, src, dest, ["doc_id"], target_files=2)
    assert table_checksum(compacted).first() == base

    # loss / duplication detection
    victim = docs.select("doc_id").first().doc_id
    dropped = docs.where(F.col("doc_id") != victim)
    d = table_checksum(dropped).first()
    assert (d.n_rows, d.checksum) != (base.n_rows, base.checksum)
    doubled = docs.unionByName(docs.where(F.col("doc_id") == victim))
    dd = table_checksum(doubled).first()
    assert (dd.n_rows, dd.checksum) != (base.n_rows, base.checksum)

    # NULL vs the string 'NULL' must not collide (null-tagged hashing)
    a = spark.createDataFrame([(1, None)], "k int, s string")
    b = spark.createDataFrame([(1, "NULL")], "k int, s string")
    assert table_checksum(a).first() != table_checksum(b).first()


def test_table_checksum_timezone_stable(spark, sf_dir):
    """Timestamp columns hash via unix_micros, so a writer session and
    a verifier session in different timezones agree on a correct copy
    (the cross-session comparison the checksum exists for)."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.maintenance import (
        table_checksum,
    )

    events = load_table(spark, sf_dir, "events")  # ts: timestamp
    prev = spark.conf.get("spark.sql.session.timeZone")
    base = table_checksum(events).first()
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        other = table_checksum(events).first()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert other == base

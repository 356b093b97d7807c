"""BM25 lexical search (operators/bm25.py, plans/searchq.py):
driver-style DuckDB parity for the registry-ready query, the
idf-dominance property the query is built to show, and the broadcast
plan shape of the statistics joins.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.bm25 import (
    bm25_scores,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import searchq
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["documents", "embeddings"], SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(searchq.ORACLES))
def test_parity(spark, ddb, name):
    spark_pdf = searchq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(searchq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_rare_term_dominates(spark):
    """The point of idf weighting: EVERY document containing the rare
    query term outscores EVERY document matching only the common terms
    (a rare term's single hit carries more information than any
    saturation-capped pile-up of common ones)."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.textstats import (
        ws_tokens,
    )

    docs = load_table(spark, SF_DIR, "documents")
    scored = searchq.q_bm25_search(spark, SF_DIR)
    # the SAME tokenizer bm25_scores uses — an inline re-implementation
    # could silently diverge from what was actually scored
    rare = docs.where(
        F.array_contains(ws_tokens(F.lower(F.col("text"))), "dup")
    ).select("doc_id")
    rows = scored.join(rare.withColumn("has_rare", F.lit(True)),
                       "doc_id", "left").collect()
    rare_scores = [r.bm25 for r in rows if r.has_rare]
    common_only = [r.bm25 for r in rows if not r.has_rare]
    assert rare_scores and common_only
    assert min(rare_scores) > max(common_only)


def test_zero_match_docs_absent(spark):
    """Documents matching no query term must not appear (no 0-score
    padding rows)."""
    docs = load_table(spark, SF_DIR, "documents")
    out = bm25_scores(docs, ["no_such_term_xyzzy"])
    assert out.count() == 0
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_null_text_docs_are_excluded_from_stats(spark):
    """A NULL-text document can never match, and it must not count in
    n_docs/avgdl either — otherwise Spark and any token-derived oracle
    accounting (unnest drops NULL docs) disagree on every idf."""
    clean = spark.createDataFrame(
        [(1, "spark spark window"), (2, "window batch")], ["doc_id", "text"]
    )
    with_null = clean.unionByName(
        spark.createDataFrame([(3, None)], "doc_id INT, text STRING")
    )
    a = bm25_scores(clean, ["spark", "window"]).orderBy("doc_id").collect()
    b = bm25_scores(with_null, ["spark", "window"]).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert all(r.doc_id != 3 for r in b)


def test_query_terms_are_normalized(spark):
    """Mixed-case and duplicated query terms must match the lowercased
    token discipline instead of being silently ignored."""
    docs = spark.createDataFrame(
        [(1, "spark window"), (2, "batch scan")], ["doc_id", "text"]
    )
    plain = bm25_scores(docs, ["spark"]).collect()
    mixed = bm25_scores(docs, ["SPARK", "Spark", "spark"]).collect()
    assert [r.asDict() for r in plain] == [r.asDict() for r in mixed]
    assert len(plain) == 1 and plain[0].doc_id == 1


def test_tf_saturation(spark):
    """k1 caps the per-term contribution: score grows sub-linearly in
    tf and never exceeds idf*(k1+1)."""
    docs = load_table(spark, SF_DIR, "documents")
    one = bm25_scores(docs, ["spark"], k1=1.2, b=0.0)
    rows = one.orderBy("doc_id").collect()
    n = docs.count()
    import math
    df = len(rows)
    cap = math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 2.2
    assert all(0 < r.bm25 < cap for r in rows)


def test_hybrid_rrf_matches_python_recomputation(spark):
    """Recompute RRF in plain python from the two ranked lists the
    query is defined over — the fused scores must agree to the 1e-6
    rounding grid, and n_lists must count the overlap correctly."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
        cosine_topk,
    )

    docs = load_table(spark, SF_DIR, "documents")
    embs = load_table(spark, SF_DIR, "embeddings")
    lex = (
        searchq.q_bm25_search(spark, SF_DIR)
        .limit(searchq.TOP_N)
        .collect()
    )
    sem = (
        cosine_topk(
            embs.where(F.col("vec_id") == searchq.HYBRID_QUERY_VEC),
            embs,
            k=searchq.TOP_N,
        )
        .orderBy("rank")
        .collect()
    )
    expected: dict[int, float] = {}
    lists: dict[int, int] = {}
    for rank, row in enumerate(lex, start=1):
        expected[row.doc_id] = expected.get(row.doc_id, 0.0) + 1.0 / (
            searchq.RRF_K + rank
        )
        lists[row.doc_id] = lists.get(row.doc_id, 0) + 1
    for row in sem:
        expected[row.match_id] = expected.get(row.match_id, 0.0) + 1.0 / (
            searchq.RRF_K + row.rank
        )
        lists[row.match_id] = lists.get(row.match_id, 0) + 1

    got = {r.doc_id: r for r in searchq.q_hybrid_search(spark, SF_DIR).collect()}
    assert set(got) == set(expected)
    for doc_id, want in expected.items():
        assert abs(got[doc_id].rrf - want) < 2e-6, doc_id
        assert got[doc_id].n_lists == lists[doc_id], doc_id
    assert docs.count() > len(got), "fusion must not emit unmatched docs"


def test_rrf_rejects_empty_input(spark):
    from data_pipeline_for_real_time_retail_analytics_spark.operators.bm25 import (
        rrf_fuse,
    )

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_rrf_three_lists_matches_python(spark):
    """The 3+-list path is where the micro-unit quantization earns its
    keep (a 3-addend double sum is fold-order-dependent); cross-check
    the fused totals against a python recomputation."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.bm25 import (
        rrf_fuse,
    )

    lists = []
    ranked_py: list[list[int]] = []
    for j, order in enumerate(([1, 2, 3, 4], [3, 1, 5, 2], [5, 4, 1, 6])):
        rows = [(doc, float(len(order) - i)) for i, doc in enumerate(order)]
        lists.append(
            (spark.createDataFrame(rows, ["doc_id", "s"]), "s")
        )
        ranked_py.append(order)
    got = {r.doc_id: r for r in rrf_fuse(lists, k=60, top_n=10).collect()}
    expected: dict[int, float] = {}
    counts: dict[int, int] = {}
    for order in ranked_py:
        for rank, doc in enumerate(order, start=1):
            expected[doc] = expected.get(doc, 0.0) + round(
                1.0 / (60 + rank) * 1e6
            ) / 1e6
            counts[doc] = counts.get(doc, 0) + 1
    assert set(got) == set(expected)
    for doc, want in expected.items():
        assert abs(got[doc].rrf - want) < 1e-9, doc
        assert got[doc].n_lists == counts[doc], doc


def test_bm25_scan_is_column_pruned(spark):
    """The corpus scan must read only (doc_id, text) — a scan carrying
    every document column into the explode is corpus-bytes wasted at
    100 TB."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        bm25_scores(docs, searchq.QUERY_TERMS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, "no parquet scan found in the plan"
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols <= {"doc_id", "text"}, f"unpruned scan: {cols}"


def test_stats_joins_are_broadcast(spark):
    """The df table and the single-row corpus stats must broadcast —
    a shuffle join against either would serialize the hit table on a
    |query|-sized key space."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        bm25_scores(docs, searchq.QUERY_TERMS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the single-row stats cross join
    assert "SortMergeJoin" not in plan

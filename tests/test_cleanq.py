"""Boilerplate-span removal (plans/cleanq.py, operators/boilerplate.py):
driver-style DuckDB parity plus semantics pins on a hand-built corpus."""

import os

import duckdb
import pytest

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.boilerplate import (
    remove_boilerplate_spans,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import cleanq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["documents"], SF_DIR)
    yield con
    con.close()


def test_parity(spark, ddb):
    name = "boilerplate_removed_docs"
    spark_pdf = cleanq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(cleanq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_covered_positions_removed_and_rest_kept(spark):
    """Two docs share the 5-gram 'a b c d e'; every covered position in
    each doc goes, the surrounding tokens survive in order."""
    df = _corpus(
        spark,
        [
            (1, "a b c d e f"),
            (2, "z a b c d e y"),
            (3, "p q r s t"),  # unique 5-gram — untouched
        ],
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_boilerplate_spans(df, n=5, min_docs=2).collect()
    }
    assert got[1] == ("f", 6, 5)
    assert got[2] == ("z y", 7, 5)
    assert got[3] == ("p q r s t", 5, 0)


def test_overlapping_matches_union_not_double_count(spark):
    """Both docs share two OVERLAPPING flagged 5-grams (positions 1 and
    2 of a 6-token text) — covered positions are a set union, so the
    whole text goes exactly once."""
    df = _corpus(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_boilerplate_spans(df, n=5, min_docs=2).collect()
    }
    assert got == {1: ("", 6), 2: ("", 6)}


def test_short_docs_pass_through(spark):
    """Docs with fewer than n tokens contribute no grams and survive
    verbatim (modulo whitespace normalization)."""
    df = _corpus(spark, [(1, "x y"), (2, "x y")])
    got = remove_boilerplate_spans(df, n=5, min_docs=2).collect()
    assert {(r["doc_id"], r["clean_text"], r["n_removed"]) for r in got} == {
        (1, "x y", 0),
        (2, "x y", 0),
    }


def test_flagging_is_doc_distinct(spark):
    """A gram repeated twice INSIDE one doc does not flag (min_docs
    counts distinct documents, the detector's pass-1 criterion)."""
    df = _corpus(
        spark,
        [(1, "a b c d e q a b c d e"), (2, "unrelated words only here now")],
    )
    got = {r["doc_id"]: r["n_removed"] for r in
           remove_boilerplate_spans(df, n=5, min_docs=2).collect()}
    assert got == {1: 0, 2: 0}


def test_plan_has_no_cartesian_or_window(spark):
    """Removal is joins + aggregates only: no cartesian product, no
    window over the corpus (reassembly sorts inside the aggregate)."""
    df = _corpus(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    plan = remove_boilerplate_spans(
        df, n=5, min_docs=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan

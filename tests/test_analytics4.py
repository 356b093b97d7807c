"""plans/analytics4.py — semantics and plan-shape pins for the r6
order-fulfilment queries (TPC-H Q3/Q6/Q12/Q19/Q21 shapes). Value-level
parity with the DuckDB twins is covered by tests/test_oracle_parity.py;
these pin the invariants parity can't see: pushdowns, the decomposed
disjunction, the window-not-self-join Q21 shape, and cross-checks
against independently-built reference frames."""

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.plans import analytics4 as A4
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table


def _plan(df) -> str:
    """Formatted explain: the plain plan toString truncates each scan's
    PushedFilters metadata at ~100 chars, silently hiding the very
    strings these pins assert on."""
    spark = df.sparkSession
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def test_shipping_priority_pushes_both_date_cuts(spark, sf_dir):
    """Q3's order-date and ship-date cuts must reach their scans (the
    pushed-filter strings themselves, not the always-present
    PushedFilters marker)."""
    df = A4.q_shipping_priority(spark, sf_dir)
    plan = _plan(df)
    assert "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    rows = df.collect()
    assert 0 < len(rows) <= A4.SHIP_TOP_N
    # ranked by revenue: output revenues are non-increasing
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_forecast_revenue_delta_is_scan_only(spark, sf_dir):
    """Q6 is a single filtered scan + agg: every predicate pushes, no
    join, no shuffle beyond the final single-row agg."""
    df = A4.q_forecast_revenue_delta(spark, sf_dir)
    plan = _plan(df)
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    assert "Join" not in plan
    r = df.collect()[0]
    assert r.forecast_revenue > 0 and r.n_lineitems > 0


def test_late_shipment_buckets_partition_all_lineitems(spark, sf_dir):
    """Every 1997 lineitem lands in exactly one bucket: the bucketed
    high+low counts must sum to the joined row count."""
    df = A4.q_late_shipment_priority(spark, sf_dir)
    rows = df.collect()
    assert {r.delay_bucket for r in rows} <= {"FAST", "NORMAL", "SLOW"}
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    total = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert sum(r.high_line_count + r.low_line_count for r in rows) == total


def test_discounted_revenue_disjunction_decomposes_to_both_scans(spark, sf_dir):
    """The Q19 OR-of-ANDs spans two tables; Catalyst must push the
    derivable per-table disjunctions into BOTH scans (brand/size on
    part, quantity bands on lineitem) instead of evaluating the whole
    predicate post-join."""
    df = A4.q_discounted_revenue(spark, sf_dir)
    plan = _plan(df)
    # part scan carries the brand disjunction...
    assert "EqualTo(p_brand,Brand#5)" in plan
    assert "EqualTo(p_brand,Brand#25)" in plan
    # ...and the lineitem scan carries the quantity-band disjunction
    assert "GreaterThanOrEqual(l_quantity,20.0)" in plan
    r = df.collect()[0]
    assert r.disc_revenue > 0 and r.n_lineitems > 0


def test_waiting_suppliers_uses_order_window_not_self_join(spark, sf_dir):
    """The per-order "only late supplier" rule must run as a window
    over the (order, supplier)-grain aggregate — one shuffle on the
    order key, bounded partitions — never an order-level self-join or
    cartesian."""
    df = A4.q_waiting_suppliers(spark, sf_dir)
    plan = _plan(df)
    assert "windowspecdefinition(l_orderkey" in plan
    assert "CartesianProduct" not in plan
    assert "EqualTo(o_orderstatus,F)" in plan
    rows = df.collect()
    assert 0 < len(rows) <= A4.WAIT_TOP_N
    waits = [r.numwait for r in rows]
    assert waits == sorted(waits, reverse=True)
    assert all(w >= 1 for w in waits)


def test_waiting_suppliers_matches_independent_rebuild(spark, sf_dir):
    """Cross-check the window formulation against an INDEPENDENT
    join-based rebuild (groupBy per order + join-back) — a window-frame
    regression must fail here."""
    got = {
        (r.s_suppkey, r.numwait)
        for r in A4.q_waiting_suppliers(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate")
                    + F.expr(f"INTERVAL {A4.WAIT_DAYS} DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    expected_full = (
        per_supp.join(per_order, "l_orderkey")
        .where(
            (F.col("is_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .collect()
    )
    expected = sorted(
        ((r.l_suppkey, r.numwait) for r in expected_full),
        key=lambda t: (-t[1], t[0]),
    )[: A4.WAIT_TOP_N]
    assert got == set(expected)

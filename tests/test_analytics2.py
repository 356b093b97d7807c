"""Plan-shape pins for plans/analytics2.py (values are covered by
test_oracle_parity): static broadcast hints must stay restricted to
bounded relations — nation/region and one-row aggregates — so the
queries survive a 100 TB scale-up with AQE free to choose strategies
for the scale-growing sides."""

import re

from data_pipeline_for_real_time_retail_analytics_spark.plans import analytics2 as A2


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _hint_count(plan: str) -> int:
    return len(re.findall(r"ResolvedHint", plan))


def test_volume_shipping_hints_only_nations(spark, sf_dir):
    df = A2.q_volume_shipping(spark, sf_dir)
    # exactly the two nation-role hints; a third would mean someone
    # force-broadcast a scale-growing table
    assert _hint_count(_analyzed(df)) == 2
    plan = _executed(df)
    assert "CartesianProduct" not in plan
    # ship-date range must reach the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_market_share_hints_only_bounded_dims(spark, sf_dir):
    df = A2.q_market_share(spark, sf_dir)
    assert _hint_count(_analyzed(df)) == 3  # cust-nation, region, supp-nation
    plan = _executed(df)
    assert "CartesianProduct" not in plan
    # the part-type predicate prunes the part scan, not a post-join filter
    assert "EqualTo(p_type,LARGE)" in plan


def test_idle_customer_balance_is_anti_join(spark, sf_dir):
    df = A2.q_idle_customer_balance(spark, sf_dir)
    assert _hint_count(_analyzed(df)) == 2  # 1-row avg aggregate + nation
    plan = _executed(df)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # order-date cutoff pushes into the orders scan feeding the anti-join
    assert "GreaterThanOrEqual(o_orderdate" in plan

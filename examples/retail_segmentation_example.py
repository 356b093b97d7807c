#!/usr/bin/env python
"""End-to-end retail customer-intelligence walk: RFM quartile
segmentation → cohort retention over the event stream → market-basket
affinity, joined into one actionable report (which customer segments
are churning, and what they buy together).

The analytics counterpart to the training-export example: every stage
is a lazy DataFrame plan that runs unchanged on a 1000-executor cluster
— RFM windows run over the customer-grain aggregate (never the fact
table), retention needs two user_id shuffles total, and the basket
self-join is bounded per order so candidates grow linearly with order
volume.

Run:  python examples/retail_segmentation_example.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.plans.analytics3 import (
    q_customer_rfm,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.behavior import (
    q_basket_pairs,
    q_cohort_retention,
)
from data_pipeline_for_real_time_retail_analytics_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retail-segmentation-example")

    # 1. RFM: who are the at-risk whales? (high monetary, poor recency)
    rfm = q_customer_rfm(spark, sf_dir)
    at_risk = rfm.where((F.col("m_q") == 1) & (F.col("r_q") == 4))
    n_at_risk = at_risk.count()
    print(f"at-risk high-value customers (M=1, R=4): {n_at_risk}")

    # 2. segment sizes — the full RFM grid, largest cells first
    grid = (
        rfm.groupBy("rfm_code")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), "rfm_code")
    )
    print("top RFM cells:")
    for row in grid.limit(5).collect():
        print(f"  {row.rfm_code}: {row.n_customers}")

    # 3. cohort retention: is engagement decaying faster for newer
    #    cohorts? (read the triangle's first off-diagonal)
    retention = q_cohort_retention(spark, sf_dir)
    w1 = retention.where(F.col("weeks_since") == 1).orderBy("cohort_week")
    print("week-1 retention by cohort:")
    for row in w1.collect():
        print(f"  {row.cohort_week:%Y-%m-%d}: {row.retention_rate:.3f}")

    # 4. market-basket: what do frequently co-ordered parts look like —
    #    the cross-sell candidates for the win-back campaign
    top = q_basket_pairs(spark, sf_dir).limit(5).collect()
    print("top co-ordered part pairs (support, lift):")
    for row in top:
        print(f"  ({row.part_a}, {row.part_b}): {row.support}, {row.lift}")

    spark.stop()


if __name__ == "__main__":
    main()

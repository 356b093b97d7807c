"""r13 pin: the sorted-basket map-side pair mining in
plans/wpagerankq.weighted_copurchase_edges must reproduce the pre-r13
okey self-join formulation exactly — same directed edge set, same
BIGINT centi-unit weights (the DuckDB oracle keeps the self-join shape,
so this pin plus the parity suite proves the rewrite from both
sides)."""

from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.plans import (
    wpagerankq,
)
from data_pipeline_for_real_time_retail_analytics_spark.sources import (
    load_table,
)


def test_weighted_edges_equal_self_join_reference(spark, sf_dir):
    got = sorted(
        tuple(r)
        for r in wpagerankq.weighted_copurchase_edges(spark, sf_dir).collect()
    )
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").alias("part"),
            (F.col("l_quantity").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cqty"),
        )
        .groupBy("okey", "part")
        .agg(F.sum("cqty").alias("cqty"))
    )
    a = baskets.select(
        "okey", F.col("part").alias("pa"), F.col("cqty").alias("qa")
    )
    b = baskets.select(
        "okey", F.col("part").alias("pb"), F.col("cqty").alias("qb")
    )
    pairs = (
        a.join(b, "okey")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.sum(F.col("qa") + F.col("qb")).alias("w"))
    )
    ref = sorted(
        tuple(r)
        for r in pairs.select(
            F.col("pa").alias("src"), F.col("pb").alias("dst"), "w"
        )
        .unionByName(
            pairs.select(
                F.col("pb").alias("src"), F.col("pa").alias("dst"), "w"
            )
        )
        .collect()
    )
    assert got == ref
    assert len(got) > 0

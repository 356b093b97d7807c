"""Property-based pins for the ninth/tenth r11 staging batches
(hypothesis, the test_prioritysample_properties.py strategy): on
arbitrary small generated inputs the Spark operators must agree with
straightforward pure-Python reimplementations of their documented
semantics — a third independent implementation next to the Spark plan
and the DuckDB oracle.

* interval_join_binned: the binned equi-join emits EXACTLY the pairs a
  brute-force O(n·m) scan of the range predicate finds — whatever the
  key distribution, timestamp clustering (including many rows on bin
  boundaries), or window width;
* CUSUM closed form: P_t − least(0, running-min P) equals the literal
  Page recursion S_t = max(0, S_{t-1} + (x_t − k)) for any integer
  series and slack.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

EPOCH_2024_US = 1_704_067_200_000_000

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),           # key
        # µs offsets clustered near multiples of the window so bin
        # boundaries are exercised hard
        st.integers(min_value=-3, max_value=3).map(lambda d: d * 60_000_000)
        | st.integers(min_value=0, max_value=300_000_000),
    ),
    min_size=0,
    max_size=15,
)


@settings(**SETTINGS)
@given(left=rows_strategy, right=rows_strategy,
       gap_s=st.sampled_from([1, 60, 3600]))
def test_interval_join_equals_brute_force(spark, left, right, gap_s):
    from data_pipeline_for_real_time_retail_analytics_spark.operators.rangejoin import (
        interval_join_binned,
    )
    from pyspark.sql import functions as F

    l = spark.createDataFrame(
        [(i, k, EPOCH_2024_US + off) for i, (k, off) in enumerate(left)],
        "l_id long, k long, us long",
    ).select("l_id", "k", F.timestamp_micros("us").alias("l_ts"))
    r = spark.createDataFrame(
        [(i, k, EPOCH_2024_US + off) for i, (k, off) in enumerate(right)],
        "r_id long, k long, us long",
    ).select("r_id", "k", F.timestamp_micros("us").alias("r_ts"))
    got = sorted(
        (row.l_id, row.r_id, row.gap_us)
        for row in interval_join_binned(
            l, r, ["k"], "l_ts", "r_ts", gap_s, gap_col="gap_us"
        ).collect()
    )
    w_us = gap_s * 1_000_000
    want = sorted(
        (li, ri, (roff - loff))
        for li, (lk, loff) in enumerate(left)
        for ri, (rk, roff) in enumerate(right)
        if lk == rk and 0 <= roff - loff <= w_us
    )
    assert got == want


@settings(**SETTINGS)
@given(
    xs=st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                max_size=25),
)
def test_cusum_closed_form_equals_the_recursion(spark, xs):
    """The window formulation over an arbitrary series (driven through
    the real plan by synthesizing one event per count unit would be
    slow — instead pin the algebra the plan implements on a frame built
    directly at the daily grain via the same expressions)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    k = (sum(xs) + len(xs) - 1) // len(xs)
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "day int, x long"
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    got = [
        r.s
        for r in df.withColumn("p", F.sum(F.col("x") - F.lit(k)).over(w))
        .withColumn(
            "s",
            F.col("p")
            - F.least(F.lit(0).cast("long"), F.min("p").over(w)),
        )
        .orderBy("day")
        .collect()
    ]
    s, want = 0, []
    for x in xs:
        s = max(0, s + (x - k))
        want.append(s)
    assert got == want

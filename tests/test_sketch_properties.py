"""Property-based pins for the round-9 second-session operators
(hypothesis, the test_newops_properties.py strategy): on arbitrary
small inputs the Spark plans must agree with straightforward Python
reimplementations of their declared semantics.

* CMS: estimate == min over depth rows of the cell sums the value
  hashes into, est >= truth always, and the per-group merge is exactly
  the direct sketch (linearity) — for arbitrary count multisets and
  arbitrary groupings;
* PSI: non-negative for ANY pair of count vectors (each addend
  (p-q)·ln(p/q) >= 0), exactly zero on identical vectors, and
  swap-symmetric in exact micro-units;
* Hilbert: bijective onto [0, 4^bits) with unit Manhattan steps for
  every consecutive index pair — the defining property — at every
  tested order.
"""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.cms import (
    cms_cells,
    cms_estimate,
    merge_cms_cells,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.drift import (
    psi_micro,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.hilbert import (
    hilbert_steps,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# ---------- CMS ----------

#: tiny vocabulary + tiny width so collisions actually occur
value = st.sampled_from([f"v{i}" for i in range(12)])
counts_list = st.lists(
    st.tuples(value, st.integers(min_value=1, max_value=50)),
    min_size=1,
    max_size=20,
)
W, D = 4, 2


def _col(v: str, r: int, width: int) -> int:
    return int(hashlib.md5(f"{v}:{r}".encode()).hexdigest()[:8], 16) % width


def _model_cells(totals: dict) -> dict:
    cells = {}
    for v, c in totals.items():
        for r in range(D):
            k = (r, _col(v, r, W))
            cells[k] = cells.get(k, 0) + c
    return cells


@given(counts_list)
@settings(**SETTINGS)
def test_cms_estimate_matches_model(spark, rows):
    totals = {}
    for v, c in rows:
        totals[v] = totals.get(v, 0) + c
    df = spark.createDataFrame(list(totals.items()), "v string, c long")
    cells = cms_cells(df, "v", "c", depth=D, width=W)
    est = cms_estimate(cells, df.select("v"), "v", depth=D, width=W)
    model_cells = _model_cells(totals)
    got = {r.v: r.est_count for r in est.collect()}
    for v, c in totals.items():
        want = min(model_cells[(r, _col(v, r, W))] for r in range(D))
        assert got[v] == want, (v, got[v], want)
        assert got[v] >= c


@given(
    counts_list,
    st.lists(st.sampled_from(["g1", "g2", "g3"]), min_size=20, max_size=20),
)
@settings(**SETTINGS)
def test_cms_merge_is_exact_for_any_grouping(spark, rows, groups):
    tagged = [(groups[i % len(groups)], v, c) for i, (v, c) in enumerate(rows)]
    df = spark.createDataFrame(tagged, "g string, v string, c long")
    per_value_g = df.groupBy("g", "v").agg(F.sum("c").cast("long").alias("c"))
    merged = {
        (r.r, r.col): r.cell
        for r in merge_cms_cells(
            cms_cells(per_value_g, "v", "c", ["g"], depth=D, width=W), ["g"]
        ).collect()
    }
    direct = {
        (r.r, r.col): r.cell
        for r in cms_cells(
            df.groupBy("v").agg(F.sum("c").cast("long").alias("c")),
            "v",
            "c",
            depth=D,
            width=W,
        ).collect()
    }
    assert merged == direct


# ---------- PSI ----------

count_vec = st.lists(
    st.integers(min_value=0, max_value=200), min_size=10, max_size=10
)


def _completed(spark, ref, cur):
    return spark.createDataFrame(
        [("g", b, r, c) for b, (r, c) in enumerate(zip(ref, cur))],
        "g string, bin int, c_ref long, c_cur long",
    )


@given(count_vec, count_vec)
@settings(**SETTINGS)
def test_psi_nonnegative_and_symmetric(spark, ref, cur):
    [fwd] = psi_micro(_completed(spark, ref, cur), ["g"]).collect()
    assert fwd.psi_micro >= 0
    assert fwd.n_ref == sum(ref) and fwd.n_cur == sum(cur)
    [bwd] = psi_micro(_completed(spark, cur, ref), ["g"]).collect()
    assert fwd.psi_micro == bwd.psi_micro


@given(count_vec)
@settings(**SETTINGS)
def test_psi_zero_on_identical_vectors(spark, ref):
    [r] = psi_micro(_completed(spark, ref, ref), ["g"]).collect()
    assert r.psi_micro == 0


# ---------- Hilbert ----------


@given(st.integers(min_value=1, max_value=5))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hilbert_bijective_unit_step_at_every_order(spark, bits):
    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    ).withColumns(
        {"__hx": F.col("x"), "__hy": F.col("y"), "d": F.lit(0).cast("long")}
    )
    for d_inc, nx, ny in hilbert_steps(F.col("__hx"), F.col("__hy"), bits):
        grid = grid.withColumns(
            {"d": F.col("d") + d_inc, "__hx": nx, "__hy": ny}
        )
    by_d = sorted((r.d, (r.x, r.y)) for r in grid.collect())
    assert [d for d, _ in by_d] == list(range(n * n))
    for (_, (x1, y1)), (_, (x2, y2)) in zip(by_d, by_d[1:]):
        assert abs(x1 - x2) + abs(y1 - y2) == 1

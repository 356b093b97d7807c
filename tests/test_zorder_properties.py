"""Property-based pins for the Z-order operator (hypothesis, same
strategy as test_curation_properties.py): on arbitrary small integer
relations the Spark Morton code must agree with a straightforward
Python reimplementation of its declared semantics, and must keep the
structural properties the layout's pruning argument relies on:

* exactness: z_value == interleave(bucket-width rescale) computed in
  plain Python on the collected rows — including wide value spans
  (the overflow regression class) and negative values;
* per-axis monotonicity: with every other coordinate fixed, a larger
  coordinate never produces a smaller z_value (bit spreading is
  strictly increasing, so file min/max rectangles stay meaningful).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_for_real_time_retail_analytics_spark.operators.zorder import (
    with_z_value,
)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

BITS = 4

coord = st.integers(min_value=-(1 << 40), max_value=1 << 40)
rows = st.lists(
    st.tuples(coord, coord), min_size=1, max_size=24, unique=True
)


def _py_z(xs, ys, bits):
    """Reference implementation: bucket-width rescale + interleave."""
    def scale(vals):
        lo, hi = min(vals), max(vals)
        width = (hi - lo) // (1 << bits) + 1
        return [(v - lo) // width for v in vals]

    sx, sy = scale(xs), scale(ys)
    out = []
    for a, b in zip(sx, sy):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (i * 2 + 1)
            z |= ((b >> i) & 1) << (i * 2)
        out.append(z)
    return out


@settings(**SETTINGS)
@given(pts=rows)
def test_z_value_matches_python_model(spark, pts):
    df = spark.createDataFrame(pts, "x LONG, y LONG")
    got = {
        (r.x, r.y): r.z_value
        for r in with_z_value(df, ["x", "y"], bits=BITS).collect()
    }
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    want = dict(zip(pts, _py_z(xs, ys, BITS)))
    assert got == want


@settings(**SETTINGS)
@given(pts=rows)
def test_z_value_is_monotone_per_axis(spark, pts):
    rows_z = with_z_value(
        spark.createDataFrame(pts, "x LONG, y LONG"), ["x", "y"], bits=BITS
    ).collect()
    by_y: dict[int, list] = {}
    by_x: dict[int, list] = {}
    for r in rows_z:
        by_y.setdefault(r.y, []).append((r.x, r.z_value))
        by_x.setdefault(r.x, []).append((r.y, r.z_value))
    for groups in (by_y, by_x):
        for pairs in groups.values():
            pairs.sort()
            zs = [z for _, z in pairs]
            assert zs == sorted(zs), "z must not decrease along an axis"

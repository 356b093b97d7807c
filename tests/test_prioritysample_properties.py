"""Property-based pins for priority sampling (hypothesis, the
test_sketch_properties.py strategy): on arbitrary small (id, weight)
multisets the Spark operator must agree with a straightforward pure-
Python reimplementation of the documented DLT semantics — a THIRD
independent implementation next to the Spark plan and the DuckDB
oracle (all three share only the md5 definition).

* the sample is exactly the k largest (priority, id-tiebreak) items;
* ranks are the descending-priority order, 1-based, gap-free;
* est_weight = max(w, τ) with τ the (k+1)-th priority — 0 (ŵ = w)
  when the input is exhausted;
* weight monotonicity: raising an included item's weight (all else
  fixed) can never evict it — its priority only grows.
"""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_for_real_time_retail_analytics_spark.operators.prioritysample import (
    priority_sample,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

items_list = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),        # id
        st.integers(min_value=1, max_value=10_000),    # weight
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


def _py_priority(item_id: int, weight: int, salt: str = "ps") -> int:
    h = int(
        hashlib.md5(f"{item_id}:{salt}".encode()).hexdigest()[:8], 16
    )
    return (max(weight, 1) * (1 << 32)) // (h + 1)


def _py_sample(items, k):
    ranked = sorted(
        ((_py_priority(i, w), i, w) for i, w in items),
        key=lambda t: (-t[0], t[1]),
    )
    tau = ranked[k][0] if len(ranked) > k else 0
    return [
        (i, w, p, rank + 1, max(w, tau))
        for rank, (p, i, w) in enumerate(ranked[:k])
    ]


@given(items=items_list, k=st.integers(min_value=1, max_value=8))
@settings(**SETTINGS)
def test_sample_matches_the_python_reimplementation(spark, items, k):
    df = spark.createDataFrame(items, "id long, w long")
    got = sorted(
        (r.id, r.weight, r.priority, r.rank, r.est_weight)
        for r in priority_sample(df, k=k, weight_col="w", id_col="id").collect()
    )
    want = sorted(
        (i, w, p, rank, est) for i, w, p, rank, est in _py_sample(items, k)
    )
    assert got == want


@given(items=items_list, k=st.integers(min_value=1, max_value=6))
@settings(**SETTINGS)
def test_weight_increase_never_evicts_an_included_item(spark, items, k):
    base = _py_sample(items, k)
    if not base:
        return
    boosted_id = base[0][0]
    boosted = [
        (i, w * 3 if i == boosted_id else w) for i, w in items
    ]
    df = spark.createDataFrame(boosted, "id long, w long")
    out = priority_sample(df, k=k, weight_col="w", id_col="id").collect()
    assert boosted_id in {r.id for r in out}

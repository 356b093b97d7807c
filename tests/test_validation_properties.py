"""Property-based validation-engine tests (hypothesis): for arbitrary
small datasets, the single-pass Spark aggregate must agree with a
straightforward Python reimplementation of the reference semantics
(null-skipping rules, null_count profiling). The reference has no
property tests (SURVEY.md §5) — this is our upgrade on its strategy."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_for_real_time_retail_analytics_spark.plans.validation import (
    Severity,
    ValidationEngine,
    ValidationRule,
)

values = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))
datasets = st.lists(st.tuples(values, values), min_size=1, max_size=30)

RULES = [
    ValidationRule("a_not_null", "not_null", "a", Severity.ERROR),
    ValidationRule("a_range", "range", "a", Severity.WARNING, {"min": -100, "max": 100}),
    ValidationRule(
        "b_allowed", "allowed_values", "b", Severity.ERROR, {"values": [0, 1, 2]}
    ),
]


def _expected(rows):
    a = [r[0] for r in rows]
    b = [r[1] for r in rows]
    return {
        "rule__a_not_null": sum(1 for v in a if v is None),
        # range/allowed skip nulls (reference: validators.py:316-340)
        "rule__a_range": sum(1 for v in a if v is not None and not -100 <= v <= 100),
        "rule__b_allowed": sum(1 for v in b if v is not None and v not in (0, 1, 2)),
        "profile__a__null_count": sum(1 for v in a if v is None),
        "total_rows": len(rows),
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=datasets)
def test_single_pass_counts_match_python_model(spark, rows):
    df = spark.createDataFrame(rows, "a long, b long")
    engine = ValidationEngine(rules=RULES, enable_profiling=True)
    got = engine.compile_plan(df, "t").first().asDict()
    for key, want in _expected(rows).items():
        assert got[key] == want, f"{key}: {got[key]} != {want} for rows={rows}"

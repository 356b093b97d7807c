"""Validation-engine semantics tests.

Replicates the reference's validator unit tests (reference:
tests/unit/test_validators.py:17-479) — same fixtures, same expected
violation counts — against the single-pass Spark plan.
"""

import pytest
from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.plans.validation import (
    Severity,
    ValidationEngine,
    ValidationRule,
)
from data_pipeline_for_real_time_retail_analytics_spark.schemas import (
    DataType,
    SchemaDefinition,
)

CLEAN_ROWS = [
    (1, "Alice", "alice@test.com", 25.0, 50000.0, "true", "2023-01-01"),
    (2, "Bob", "bob@test.com", 30.0, 60000.0, "true", "2023-01-02"),
    (3, "Charlie", "charlie@test.com", 35.0, 70000.0, "false", "2023-01-03"),
    (4, "David", "david@test.com", 40.0, 80000.0, "true", "2023-01-04"),
    (5, "Eve", "eve@test.com", 45.0, 90000.0, "false", "2023-01-05"),
]

# reference fixture tests/unit/test_validators.py:31-42 (mixed-type columns
# land as strings in a typed engine)
PROBLEM_ROWS = [
    (1, "Alice", "alice@test.com", 25.0, 50000.0, "true", "2023-01-01"),
    (2, None, "invalid", -5.0, float("inf"), "yes", "2025-12-31"),
    (2, "Charlie", None, 150.0, -1000.0, "0", "invalid-date"),
    (4, "", "david@test.com", 40.0, 80000.0, "1", "2023-01-04"),
    (None, "Eve", "not-an-email", None, None, None, None),
]

COLUMNS = "id long, name string, email string, age double, salary double, is_active string, created_at string"

RULES = [
    ValidationRule("id_not_null", "not_null", "id", Severity.ERROR),
    ValidationRule("age_range", "range", "age", Severity.WARNING, {"min": 0, "max": 120}),
    ValidationRule(
        "email_pattern", "pattern", "email", Severity.ERROR,
        {"pattern": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"},
    ),
    ValidationRule("name_length", "length", "name", Severity.WARNING, {"min": 1, "max": 50}),
    ValidationRule(
        "status_allowed", "allowed_values", "is_active", Severity.ERROR,
        {"values": ["true", "false", "1", "0", "yes", "no"]},
    ),
]

SCHEMA = SchemaDefinition(
    "test_table",
    columns={
        "id": DataType.INTEGER,
        "name": DataType.STRING,
        "email": DataType.EMAIL,
        "age": DataType.INTEGER,
        "salary": DataType.FLOAT,
        "is_active": DataType.BOOLEAN,
        "created_at": DataType.DATETIME,
    },
    required_columns=["id", "name", "email"],
    nullable_columns=["salary"],
    unique_columns=["id", "email"],
    primary_key=["id"],
)


@pytest.fixture(scope="module")
def engine():
    return ValidationEngine(schemas={"test_table": SCHEMA}, rules=RULES)


def _counts(engine, df):
    return engine.compile_plan(df, "test_table").first().asDict()


def test_clean_data_has_no_violations(spark, engine):
    df = spark.createDataFrame(CLEAN_ROWS, COLUMNS)
    report = engine.validate(df, "test_table")
    assert report.is_valid
    assert report.total_rows == 5
    assert report.data_quality_score == 1.0


def test_rule_violation_counts(spark, engine):
    df = spark.createDataFrame(PROBLEM_ROWS, COLUMNS)
    row = _counts(engine, df)
    assert row["rule__id_not_null"] == 1        # one null id
    assert row["rule__age_range"] == 2          # -5 and 150 (null skipped)
    assert row["rule__email_pattern"] == 2      # 'invalid', 'not-an-email' (null skipped)
    assert row["rule__name_length"] == 1        # '' (null skipped)
    assert row["rule__status_allowed"] == 0     # all non-null values allowed


def test_schema_constraint_counts(spark, engine):
    df = spark.createDataFrame(PROBLEM_ROWS, COLUMNS)
    row = _counts(engine, df)
    assert row["dup_violation__id"] == 1        # id=2 twice
    assert row["dup_violation__email"] == 0     # nulls excluded from uniqueness
    assert row["pk_violation"] == 1
    assert row["null_violation__id"] == 1
    assert row["null_violation__name"] == 1
    assert row["null_violation__email"] == 1
    assert row["type_invalid__email"] == 2      # email semantic type
    assert row["type_invalid__created_at"] == 1  # 'invalid-date'
    assert row["type_invalid__is_active"] == 0  # lexicon accepts true/yes/0/1


def test_missing_required_columns(spark, engine):
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    report = engine.validate(df, "test_table")
    assert any(e["rule"] == "missing_required_columns" for e in report.errors)


def test_profiling_stats(spark, engine):
    df = spark.createDataFrame(CLEAN_ROWS, COLUMNS)
    report = engine.validate(df, "test_table")
    age = report.column_stats["age"]
    assert age["null_count"] == 0
    assert age["unique_count"] == 5
    assert age["mean"] == 35.0
    assert age["median"] == 35.0
    assert age["min"] == 25 and age["max"] == 45
    assert age["zero_count"] == 0 and age["negative_count"] == 0
    name = report.column_stats["name"]
    assert name["min_length"] == 3 and name["max_length"] == 7
    assert name["empty_string_count"] == 0


def test_quality_score_formula(spark, engine):
    df = spark.createDataFrame(PROBLEM_ROWS, COLUMNS)
    report = engine.validate(df, "test_table")
    # exact reference formula: 1 - (errors*1 + warnings*0.5 + info*0.1)/(rows*ncols)
    err = sum(e["affected_rows"] for e in report.errors)
    warn = sum(w["affected_rows"] for w in report.warnings)
    info = sum(i["affected_rows"] for i in report.info)
    expected = round(max(0.0, 1.0 - (err + 0.5 * warn + 0.1 * info) / (5 * 7)), 3)
    assert report.data_quality_score == expected
    assert not report.is_valid


def test_empty_dataset_warning(spark, engine):
    df = spark.createDataFrame([], COLUMNS)
    report = engine.validate(df, "test_table")
    assert report.total_rows == 0
    assert report.warnings[0]["rule"] == "empty_dataset"
    assert report.data_quality_score == 0.0


def test_custom_business_hours(spark):
    # reference: tests/unit/test_validators.py:448-462 — 2 violations
    eng = ValidationEngine(rules=[
        ValidationRule("bh", "custom", "ts", Severity.WARNING,
                       {"function": "business_hours", "start_hour": 9, "end_hour": 17}),
    ])
    df = spark.createDataFrame(
        [("2023-01-02 10:00:00",), ("2023-01-02 08:00:00",),
         ("2023-01-02 17:30:00",), ("2023-01-02 12:00:00",), (None,)],
        "ts string",
    )
    assert eng.compile_plan(df, "t").first()["rule__bh"] == 2


def test_custom_future_date(spark):
    # reference: tests/unit/test_validators.py:464-479 — 2 violations
    eng = ValidationEngine(rules=[
        ValidationRule("fd", "custom", "d", Severity.ERROR,
                       {"function": "future_date", "as_of": "2024-06-01"}),
    ])
    df = spark.createDataFrame(
        [("2023-01-01",), ("2024-06-01",), ("2099-01-01",), ("bogus",), (None,)],
        "d string",
    )
    # 2099 future + unparseable 'bogus' = 2
    assert eng.compile_plan(df, "t").first()["rule__fd"] == 2


def test_invalid_row_filter(spark, engine):
    df = spark.createDataFrame(PROBLEM_ROWS, COLUMNS)
    kept = engine.invalid_row_filter(df)
    rows = kept.collect()
    # rows violating any rule dropped: null id, bad emails, '' name, -5/150 age
    assert all(r.id is not None for r in rows)


def test_single_pass_plan(spark, engine):
    """The whole validation must be one aggregation over one scan."""
    df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    eng = ValidationEngine(
        schemas={"customer": SchemaDefinition(
            "customer",
            columns={"c_custkey": DataType.INTEGER, "c_name": DataType.STRING},
            required_columns=["c_custkey"],
            unique_columns=["c_custkey"],
            primary_key=["c_custkey"],
        )},
        rules=[ValidationRule("bal", "range", "c_acctbal", Severity.WARNING,
                              {"min": -1000, "max": 11000})],
    )
    plan = eng.compile_plan(df, "customer")
    physical = plan._jdf.queryExecution().executedPlan().toString()
    assert physical.count("FileScan") == 1

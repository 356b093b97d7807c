"""Engine facade tests (SURVEY.md §3 EP3: register -> detect -> extract ->
validate -> load as the library-path public API)."""

import uuid

import pytest

from data_pipeline_for_real_time_retail_analytics_spark.engine import Engine
from datetime import datetime, timezone

from data_pipeline_for_real_time_retail_analytics_spark.operators.cdc import ChangeType
from data_pipeline_for_real_time_retail_analytics_spark.operators.detection import ChangeEvent
from data_pipeline_for_real_time_retail_analytics_spark.plans.validation import (
    Severity,
    ValidationRule,
)
from data_pipeline_for_real_time_retail_analytics_spark.schemas import DataType, SchemaDefinition
from data_pipeline_for_real_time_retail_analytics_spark.sources.registry import FileSource


@pytest.fixture()
def engine(spark, sf_dir):
    schema = SchemaDefinition(
        "orders",
        columns={"o_orderkey": DataType.INTEGER},
        required_columns=["o_orderkey", "o_custkey"],
        unique_columns=["o_orderkey"],
        primary_key=["o_orderkey"],
    )
    rules = [
        ValidationRule("status_allowed", "allowed_values", "o_orderstatus",
                       Severity.ERROR, {"values": ["F", "O", "P"]}),
    ]
    eng = Engine(spark, schemas={"orders": schema}, rules=rules,
                 database=f"eng_{uuid.uuid4().hex[:8]}")
    eng.register_source(
        FileSource(source_id="orders_src", path=f"{sf_dir}/orders.parquet"),
        probe=lambda: [ChangeEvent("orders_src", "orders", ChangeType.UPDATE,
                                   datetime.now(timezone.utc), 1)],
    )
    return eng


def test_engine_end_to_end(spark, engine):
    events = engine.detect()
    assert engine.source_status()["orders_src"]["healthy"]
    assert len(events["orders_src"]) == 1

    report, result = engine.run_once("orders_src", "orders", mode="overwrite")
    assert report.is_valid and report.data_quality_score == 1.0
    assert result is not None and result.success
    assert spark.table(result.target_table).count() == result.rows_loaded > 0


def test_engine_skips_when_no_changes(spark, engine, sf_dir):
    quiet = Engine(spark, database=f"eng_{uuid.uuid4().hex[:8]}")
    quiet.register_source(
        FileSource(source_id="quiet_src", path=f"{sf_dir}/orders.parquet"),
        probe=lambda: [],  # probe reports nothing new
    )
    report, result = quiet.run_once("quiet_src", "orders")
    assert result is None  # skip-if-no-changes: nothing loaded
    assert report.is_valid


def test_engine_extract_retries_through_backoff(spark, sf_dir):
    attempts = {"n": 0}

    class Flaky:
        source_id = "flaky"

        def extract(self, spark_, **kw):
            attempts["n"] += 1
            if attempts["n"] < 2:
                raise ConnectionError("transient")
            return spark_.range(3)

    eng = Engine(spark, retry_delay=0.0)
    eng.register_source(Flaky())
    assert eng.extract("flaky").count() == 3
    assert attempts["n"] == 2


def test_engine_detect_failure_is_contained(spark, sf_dir):
    eng = Engine(spark)
    eng.register_source(
        FileSource(source_id="bad", path=f"{sf_dir}/orders.parquet"),
        probe=lambda: (_ for _ in ()).throw(RuntimeError("probe down")),
    )
    events = eng.detect()
    assert events["bad"] == []
    st = eng.source_status()["bad"]
    assert not st["healthy"] and "probe down" in st["last_error"]

#!/usr/bin/env python
"""End-to-end library walk: detect → extract → validate → profile →
quality gate → load, on the synthetic star schema.

Spark-first re-expression of the reference's programmatic path
(reference: examples/extraction_validation_example.py:55-208, entry
point EP3 in SURVEY.md §3): the thread pool and pandas frames are
replaced by lazy DataFrame plans; validation is ONE aggregate pass.

Run:  python examples/extraction_validation_example.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from data_pipeline_for_real_time_retail_analytics_spark.operators.cdc import WatermarkStore
from data_pipeline_for_real_time_retail_analytics_spark.operators.detection import (
    MultiSourceChangeDetector,
    TimestampChangeDetector,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans.validation import (
    Severity,
    ValidationEngine,
    ValidationRule,
)
from data_pipeline_for_real_time_retail_analytics_spark.schemas import (
    DataType,
    SchemaDefinition,
)
from data_pipeline_for_real_time_retail_analytics_spark.session import get_spark
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table
from data_pipeline_for_real_time_retail_analytics_spark.sources.registry import FileSource
from data_pipeline_for_real_time_retail_analytics_spark.sources.sink import WarehouseSink


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example")

    # 1. change detection: has anything new arrived in events?
    store = WatermarkStore(tempfile.mkdtemp(prefix="wm_"))
    detector = TimestampChangeDetector(store, ts_col="ts")
    multi = MultiSourceChangeDetector()
    events_df = load_table(spark, sf_dir, "events")
    multi.register_source(
        "events_src", lambda: detector.detect("events_src", "events", events_df)
    )
    changes = multi.detect_all_changes()
    print(f"detected: { {k: len(v) for k, v in changes.items()} }")
    print(f"source health: {multi.get_source_status()}")

    # 2. extraction: incremental scan with the watermark pushed to the scan
    src = FileSource(source_id="orders_src", path=f"{sf_dir}/orders.parquet")
    orders = src.extract(spark)  # full first load
    print(f"extracted {orders.count()} orders")

    # 3. validation: schema + rules + profiling in ONE aggregate pass
    schema = SchemaDefinition(
        "orders",
        columns={"o_orderkey": DataType.INTEGER, "o_totalprice": DataType.FLOAT},
        required_columns=["o_orderkey", "o_custkey"],
        unique_columns=["o_orderkey"],
        primary_key=["o_orderkey"],
    )
    rules = [
        ValidationRule("price_range", "range", "o_totalprice", Severity.WARNING,
                       {"min": 0, "max": 500_000}),
        ValidationRule("status_allowed", "allowed_values", "o_orderstatus",
                       Severity.ERROR, {"values": ["F", "O", "P"]}),
        ValidationRule("no_future_orders", "custom", "o_orderdate",
                       Severity.ERROR, {"function": "future_date"}),
    ]
    engine = ValidationEngine(schemas={"orders": schema}, rules=rules)
    report = engine.validate(orders, "orders")
    print(f"quality score: {report.data_quality_score}; "
          f"errors: {len(report.errors)}; warnings: {len(report.warnings)}")
    print(f"gate passed: {engine.quality_gate(report)}")

    # 4. load the validated batch into a catalog table
    sink = WarehouseSink(spark, database="example_wh")
    result = sink.load(orders, "orders_validated", mode="overwrite")
    print(f"loaded {result.rows_loaded} rows into {result.target_table}")

    spark.stop()


if __name__ == "__main__":
    main()

"""Zone-map data skipping (plans/zonemapq.py, operators/zonemap.py):
driver-style DuckDB parity plus the pruning-effect pins the
layout-invariant oracle cannot see."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.operators.zonemap import (
    build_file_zonemaps,
    prune_files,
    zonemap_scan,
)
from data_pipeline_for_real_time_retail_analytics_spark.plans import zonemapq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["orders"], SF_DIR)
    yield con
    con.close()


def test_parity(spark, ddb):
    spark_pdf = zonemapq.QUERIES["zonemap_pruned_orders"](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(zonemapq.ORACLES["zonemap_pruned_orders"]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, "zonemap_pruned_orders")


def test_prune_actually_skips_files(spark):
    """The point of the layout: the date predicate covers ~1/28th of
    the o_orderdate span, so on a 16-file range-clustered table most
    files must be skipped — and every skipped file must hold no
    matching row (soundness is the parity test; this pins skipping)."""
    path = zonemapq._clustered_orders_path(spark, SF_DIR)
    zm = build_file_zonemaps(spark, path, ["o_orderdate", "o_totalprice"])
    preds = {
        "o_orderdate": (
            F.to_timestamp(F.lit(zonemapq.DATE_LO)),
            F.to_timestamp(F.lit(zonemapq.DATE_HI)),
        ),
        "o_totalprice": (zonemapq.PRICE_LO, zonemapq.PRICE_HI),
    }
    files, total = prune_files(zm, preds)
    assert total == zonemapq.N_FILES
    assert 0 < len(files) < total // 2, (len(files), total)


def test_price_zones_do_not_prune_on_date_layout(spark):
    """o_totalprice is uncorrelated with the date layout, so every file
    spans nearly the full price range and a PRICE-ONLY predicate prunes
    nothing — the negative result that shows zone maps skip by LAYOUT
    CORRELATION, not magic (and why Z-order exists for multi-dimension
    predicates, operators/zorder.py)."""
    path = zonemapq._clustered_orders_path(spark, SF_DIR)
    zm = build_file_zonemaps(spark, path, ["o_orderdate", "o_totalprice"])
    files, total = prune_files(
        zm, {"o_totalprice": (zonemapq.PRICE_LO, zonemapq.PRICE_HI)}
    )
    assert len(files) == total


def test_empty_predicate_box_reads_zero_files(spark):
    """A predicate box outside every zone reads no file at all and
    still returns an empty, correctly-shaped result."""
    path = zonemapq._clustered_orders_path(spark, SF_DIR)
    zm = build_file_zonemaps(spark, path, ["o_orderdate", "o_totalprice"])
    result, n_read, n_total = zonemap_scan(
        spark, zm, {"o_totalprice": (-2.0, -1.0)}
    )
    assert n_read == 0 and n_total == zonemapq.N_FILES
    assert result.count() == 0
    assert "o_orderkey" in result.columns


def test_scan_equals_full_filter(spark):
    """Prune + residual ≡ full-scan filter, checked Spark-vs-Spark on
    the staged layout (engine-independent of the DuckDB parity)."""
    path = zonemapq._clustered_orders_path(spark, SF_DIR)
    zm = build_file_zonemaps(spark, path, ["o_orderdate", "o_totalprice"])
    preds = {"o_totalprice": (150_000.0, 160_000.0)}
    pruned, _, _ = zonemap_scan(spark, zm, preds)
    full = (
        spark.read.parquet(path)
        .where(F.col("o_totalprice").between(150_000.0, 160_000.0))
    )
    assert pruned.exceptAll(full).count() == 0
    assert full.exceptAll(pruned).count() == 0

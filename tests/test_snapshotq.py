"""Snapshot-diff showcase queries (plans/snapshotq.py): driver-style
DuckDB parity plus the op-class sanity the synthetic carve-outs
guarantee. The operator itself is covered in tests/test_snapshot_diff.py;
this file proves the registry-ready query/oracle pair.
"""

import os

import duckdb
import pytest

import test_oracle_parity as par
from data_pipeline_for_real_time_retail_analytics_spark.plans import snapshotq

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def ddb():
    con = par.make_views(duckdb.connect(), ["orders"], SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(snapshotq.ORACLES))
def test_parity(spark, ddb, name):
    spark_pdf = snapshotq.QUERIES[name](spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(snapshotq.ORACLES[name]).fetchdf()
    par.assert_frames_match(spark_pdf, duck_pdf, name)


def test_all_three_op_classes_present(spark):
    """The modulus carve-outs guarantee inserts, updates, AND deletes at
    any SF with >= a few hundred orders."""
    rows = snapshotq.q_orders_snapshot_summary(spark, SF_DIR).collect()
    by_op = {r.op: r.n_rows for r in rows}
    assert set(by_op) == {"insert", "update", "delete"}
    assert all(n > 0 for n in by_op.values())


def test_doubly_excluded_rows_absent(spark):
    """A row excluded from BOTH snapshots must not appear in the diff."""
    diff = snapshotq.q_orders_snapshot_diff(spark, SF_DIR)
    both = diff.where(
        (diff.o_orderkey % snapshotq.INSERT_MOD == snapshotq.INSERT_REM)
        & (diff.o_orderkey % snapshotq.DELETE_MOD == snapshotq.DELETE_REM)
    )
    assert both.count() == 0

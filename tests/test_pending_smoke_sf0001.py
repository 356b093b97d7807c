"""Smallest-SF smoke for every staged pair (plans/pending_r10.py): the
driver gate runs at sf0.01 and the scale harness at sf0.1+, so sf0.001
is the one generated dataset the staged families never touch — and the
scale where empty windows, absent groups, and sample-miss edge cases
live. Each query must EXECUTE and return a well-formed frame there;
families with a structural minimum output also assert it."""

import pytest

from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r10 import (
    PENDING_QUERIES,
)

SMALL = "/root/testdata/sf0.001"

#: queries whose output can legitimately be empty at 50 docs / 1k events
MAY_BE_EMPTY = {
    # planted near-dup pair grain: planting is every 25th doc, so tiny
    # corpora can hold pairs — but chunk/triangle/eval grains derive
    # from thresholded structures that may not materialize at this SF
    "copurchase_triangles",
}


@pytest.mark.parametrize("name", sorted(PENDING_QUERIES))
def test_runs_at_smallest_sf(spark, name):
    df = PENDING_QUERIES[name](spark, SMALL)
    rows = df.collect()
    assert df.columns, name
    if name not in MAY_BE_EMPTY:
        assert rows, f"{name} empty at sf0.001"

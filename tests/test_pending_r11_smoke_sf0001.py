"""Smallest-SF smoke for the r11-staged pairs (plans/pending_r11.py) —
the test_pending_smoke_sf0001.py discipline extended to the r11
roster: the driver gate runs at sf0.01 and the scale harness at
sf0.1+, so sf0.001 is where empty windows, absent groups, and
sample-miss edges live. Each query must EXECUTE and return a
well-formed frame; families with a structural minimum also assert it.
"""

import pytest

from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_r11 import (
    PENDING_QUERIES,
)

SMALL = "/root/testdata/sf0.001"

#: queries whose output can legitimately be empty at 50 docs / 1k events
MAY_BE_EMPTY = {
    # ~1k events over 30 days → ~0.35 events/user/day: a click→error
    # coincidence inside one hour may simply not exist
    "click_error_interval",
    # the fixed 2-token phrase may not occur in a 50-doc corpus
    "phrase_search",
    # near-dup planting is every 25th doc → 2 plants at 50 docs; the
    # derived histograms/clusters may not materialize
    "pair_jaccard_histogram",
    "dup_cluster_sizes",
    # cross-source 8-gram co-occurrence under the df cap may vanish
    "source_overlap_matrix",
}


@pytest.mark.parametrize("name", sorted(PENDING_QUERIES))
def test_runs_at_smallest_sf(spark, name):
    df = PENDING_QUERIES[name](spark, SMALL)
    rows = df.collect()
    assert df.columns, name
    if name not in MAY_BE_EMPTY:
        assert rows, f"{name} empty at sf0.001"

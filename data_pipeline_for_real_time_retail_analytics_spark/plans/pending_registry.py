"""Aggregated registry-ready queries awaiting driver slots (r7 flip).

``__spark_entry__.queries()``/``oracle_sql()`` could not take new
entries in round 6 (the front-50 window was exactly consumed and a new
entry is never-green by definition), so the ten proven query/oracle
pairs live in their five plan modules with local driver-identical
parity. This module aggregates them so the r7 registration is a
two-line change in ``__spark_entry__``::

    from data_pipeline_for_real_time_retail_analytics_spark.plans.pending_registry import (
        PENDING_QUERIES, PENDING_ORACLES,
    )
    # splice PENDING_QUERIES into the FRONT of queries() (never-green →
    # front window, rotation rule) and PENDING_ORACLES anywhere in
    # oracle_sql(); then add each name to ROTATION.json with null.

Keys here are exactly the names the parity tests prove; insertion
order is the recommended registration order (cheapest first, the
member-materializing semantic family last so its one-time cost lands
in predictable bench cells — NOTES.md records expected sf0.1 walls).
"""

from __future__ import annotations

from . import contamq, exportq, semdedupq, snapshotq, streamq2

_MODULES = (snapshotq, exportq, contamq, streamq2, semdedupq)

PENDING_QUERIES = {
    name: fn for mod in _MODULES for name, fn in mod.QUERIES.items()
}
PENDING_ORACLES = {
    name: sql for mod in _MODULES for name, sql in mod.ORACLES.items()
}

assert set(PENDING_QUERIES) == set(PENDING_ORACLES)

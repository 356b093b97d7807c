"""Aggregated curation/maintenance queries — REGISTERED in round 6.

The ten query/oracle pairs built across the five plan modules below
(snapshot diff/summary, aggregate maintenance, shard-manifest export,
semantic contamination, stream-static enrichment, SemDeDup family)
are spliced from here into the FRONT of ``__spark_entry__.queries()``
/ ``oracle_sql()`` (never-green → front window, per the rotation rule
mechanized in tests/test_rotation_guard.py). This module stays the
single aggregation point so the registration is one ``**`` splice on
each side; ROTATION.json carries each name (null until its first
driver CORRECTNESS green lands).

Keys are exactly the names the parity tests prove; insertion order is
registration order (cheapest first, the member-materializing semantic
family last so its one-time cost lands in predictable bench cells —
NOTES.md records expected sf0.1 walls).
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

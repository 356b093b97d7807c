"""Registry-ready queries awaiting round-10 driver slots.

Same staging mechanism as plans/pending_registry.py (registered r6)
through plans/pending_r9.py (r9): query/oracle pairs proven with
driver-identical local parity aggregate here so the r10 registration
is one ``**`` splice on each side of ``__spark_entry__`` plus null
rows in ROTATION.json. The r9 front window is exactly consumed by the
9 never-green registrations plus the oldest stale cohorts, so these
wait.

Registration recipe: see plans/pending_r9.py — ledger roll first, then
the splice, then recompose FRONT_50/deferred, then the FULL pytest
suite (never just the guard subset).

Keys are exactly the names their parity tests prove; insertion order is
the recommended registration order.
"""

from __future__ import annotations

from . import (
    annevalq,
    approxq,
    chunkdedupq,
    cmsq,
    dedupevalq,
    driftq,
    hardnegq,
    hilbertq,
    ivfpqq,
    pmiq,
    sessionattrq,
    sketchq,
    streamattrq,
    streamcmsq,
    trianglesq,
    wpagerankq,
)

_MODULES = (
    approxq,
    sketchq,
    cmsq,
    streamcmsq,
    driftq,
    hilbertq,
    hardnegq,
    annevalq,
    pmiq,
    wpagerankq,
    sessionattrq,
    streamattrq,
    chunkdedupq,
    ivfpqq,
    dedupevalq,
    trianglesq,
)

PENDING_QUERIES = {
    name: fn for mod in _MODULES for name, fn in mod.QUERIES.items()
}
PENDING_ORACLES = {
    name: sql for mod in _MODULES for name, sql in mod.ORACLES.items()
}

assert set(PENDING_QUERIES) == set(PENDING_ORACLES)

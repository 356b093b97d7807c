"""Registry-ready queries awaiting round-11 driver slots.

Same staging mechanism as plans/pending_registry.py (registered r6)
through plans/pending_r10.py (r10): query/oracle pairs proven with
driver-identical local parity aggregate here so the r11 registration
is one ``**`` splice on each side of ``__spark_entry__`` plus null
rows in ROTATION.json. The r10 front window is exactly consumed by the
21 never-green registrations plus the oldest stale cohorts, so these
wait.

Registration recipe: see plans/pending_r9.py — ledger roll first, then
the splice, then recompose FRONT_50/deferred, then the FULL pytest
suite (never just the guard subset).

Keys are exactly the names their parity tests prove; insertion order is
the recommended registration order.
"""

from __future__ import annotations

from . import (
    asofq,
    audienceq,
    bloomdedupq,
    bpeq,
    clusterstatq,
    cusumq,
    crossdupq,
    embdriftq,
    funnelq,
    incannq,
    langquotaq,
    lenbucketq,
    outlierq,
    pairsimq,
    phraseq,
    prioritysampleq,
    rangejoinq,
    streamdriftq,
    streamkmvq,
    trendq,
)

_MODULES = (
    asofq,
    bloomdedupq,
    langquotaq,
    phraseq,
    lenbucketq,
    streamdriftq,
    funnelq,
    embdriftq,
    clusterstatq,
    outlierq,
    pairsimq,
    prioritysampleq,
    incannq,
    crossdupq,
    streamkmvq,
    rangejoinq,
    bpeq,
    trendq,
    audienceq,
    cusumq,
)

PENDING_QUERIES = {
    name: fn for mod in _MODULES for name, fn in mod.QUERIES.items()
}
PENDING_ORACLES = {
    name: sql for mod in _MODULES for name, sql in mod.ORACLES.items()
}

assert set(PENDING_QUERIES) == set(PENDING_ORACLES)

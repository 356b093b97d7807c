"""Registry-ready queries awaiting round-9 driver slots.

Same staging mechanism as plans/pending_registry.py (registered r6),
plans/pending_r7.py (r7) and plans/pending_r8.py (r8): query/oracle
pairs proven with driver-identical local parity aggregate here so the
r9 registration is one ``**`` splice on each side of
``__spark_entry__`` plus null rows in ROTATION.json. The r8 front
window is exactly consumed by the 14 never-green pairs plus the oldest
stale cohorts, so these wait.

Keys are exactly the names their parity tests prove; insertion order is
the recommended registration order.
"""

from __future__ import annotations

from . import (
    containmentq,
    fuzzyq,
    kmvq,
    markovq,
    pagerankq,
    skewq,
    splitsq,
    zonemapq,
)

_MODULES = (
    kmvq,
    zonemapq,
    containmentq,
    fuzzyq,
    splitsq,
    pagerankq,
    markovq,
    skewq,
)

PENDING_QUERIES = {
    name: fn for mod in _MODULES for name, fn in mod.QUERIES.items()
}
PENDING_ORACLES = {
    name: sql for mod in _MODULES for name, sql in mod.ORACLES.items()
}

assert set(PENDING_QUERIES) == set(PENDING_ORACLES)
